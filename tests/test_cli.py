"""CLI (spark-submit entry point): crawl + resume + learn-model,
driven through crawler_spark.cli.main (getOrCreate reuses the test
session)."""

import json
import os

from crawler_spark import cli


def test_cli_crawl_and_model(spark, tmp_path, capsys):
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text(
        "# comment line\n"
        "http://host0.test/p/0/img-42-00000000\n"
        "\n"
        "http://host1.test/p/7/img-42-00000111\n"
    )
    ck = tmp_path / "ck"
    rc = cli.main(
        [
            "crawl",
            "--seeds", str(seeds_file),
            "--checkpoint", str(ck),
            "--synth-pages", "300",
            "--synth-hosts", "10",
            "--epochs", "2",
            "--epoch-ms", "8000",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["manifest"]["dequeue_seq"] > 0
    assert len(out["metrics"]) == 2
    assert any(x.startswith("snap-") for x in os.listdir(ck))

    # resume continues from the snapshot
    rc = cli.main(
        [
            "crawl",
            "--seeds", str(seeds_file),
            "--checkpoint", str(ck),
            "--synth-pages", "300",
            "--synth-hosts", "10",
            "--epochs", "3",
            "--epoch-ms", "8000",
            "--resume",
        ]
    )
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["manifest"]["epoch"] == 2
    assert out2["manifest"]["dequeue_seq"] >= out["manifest"]["dequeue_seq"]

    model_path = tmp_path / "model.json"
    rc = cli.main(
        [
            "learn-model",
            "--checkpoint", str(ck),
            "--synth-pages", "300",
            "--synth-hosts", "10",
            "--out", str(model_path),
        ]
    )
    assert rc == 0
    model = json.loads(model_path.read_text())
    assert len(model["leaf_xpath_freqs"]) > 0
    freqs = [x["freq"] for x in model["leaf_xpath_freqs"]]
    assert freqs == sorted(freqs, reverse=True)
