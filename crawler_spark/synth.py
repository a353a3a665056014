"""Deterministic synthetic web — image+caption corpus (FIXTURES.md §1).

One vectorized numpy implementation generates every row as a **pure
function of (seed, page index)**; the Spark engine materializes it
distributed via ``mapInPandas`` over ``spark.range`` (each partition
generates independently — this is how you synthesize a 10^10-row frontier
on a cluster without a driver bottleneck), and the sequential oracle calls
the very same function on the driver. One implementation, two callers ⇒
the two sides cannot see different webs.

Shape per BASELINE.json ``input_hint``: ``(image_id, bytes, w, h, fmt,
caption, phash)`` + url/host/out_links/is_leaf link-graph columns.

Image codec: the container has no image libraries, so a deliberately
simple deterministic codec stands in (multimodal plumbing is real, the
codec is the stub — see ``crawler_spark/multimodal``): header
``SGI1 | fmt byte | w u16le | h u16le`` + grayscale payload; ``png`` is
lossless, ``jpeg`` quantizes pixels to even values, giving a decoded-pixel
PSNR ≈ 51 dB ≥ the 40 dB invariant demanded by ``input_hint``.

Host sizes are Zipf-skewed (quadratic tail) over contiguous index ranges
— exercising the host-skew salting/AQE path (SURVEY.md §2.12 PO3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .schema import CORPUS_SCHEMA

_M = np.uint64(0xFFFFFFFFFFFFFFFF)
_K_IDX = 0x9E3779B97F4A7C15
_K_SALT = 0xD1B54A32D192ED03
_K_SEED = 0x2545F4914F6CDD1D
_K_LINK = 0x632BE59BD9B4E019

XPATHS = [
    "//div[contains(@class,'nav')]/a",
    "//ul[contains(@class,'menu')]/li/a",
    "//div[contains(@class,'content')]/a",
    "//table[contains(@class,'listing')]//a",
    "//div[contains(@class,'pager')]/a",
    "//span[contains(@class,'crumb')]/a",
]


def mix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (wraps mod 2^64)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


@dataclass(frozen=True)
class SynthConfig:
    seed: int = 42
    n_pages: int = 2000
    n_hosts: int = 20
    zipf_a: float = 1.1
    dims: tuple = (32, 64, 128)
    with_images: bool = True
    link_max: int = 12
    n_path_buckets: int = 8
    # S3 redirect closure: ~1/5 pages get an /alias/ URL that 301s to
    # them, and ~1/3 of links targeting such pages use the alias href
    with_aliases: bool = False

    @property
    def host_bounds(self) -> np.ndarray:
        """Cumulative page-index boundary per host (len n_hosts+1).
        Contiguous Zipf-sized ranges: host 0 largest."""
        w = 1.0 / np.power(np.arange(1, self.n_hosts + 1), self.zipf_a)
        cum = np.concatenate([[0.0], np.cumsum(w / w.sum())])
        b = np.floor(cum * self.n_pages).astype(np.int64)
        b[-1] = self.n_pages
        return b


def _r(cfg: SynthConfig, idx: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (
            idx.astype(np.uint64) * np.uint64(_K_IDX)
            + np.uint64(salt) * np.uint64(_K_SALT)
            + np.uint64(cfg.seed) * np.uint64(_K_SEED)
        )
    return mix64_np(x)


def _vocab(cfg: SynthConfig) -> np.ndarray:
    """512 deterministic 5-letter tokens."""
    v = _r(cfg, np.arange(512, dtype=np.int64), 777)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    cols = [letters[((v >> np.uint64(8 * j)) % np.uint64(26)).astype(np.int64)] for j in range(5)]
    return np.array(["".join(t) for t in zip(*cols)])


def host_of_index(cfg: SynthConfig, idx: np.ndarray) -> np.ndarray:
    return np.searchsorted(cfg.host_bounds, idx, side="right") - 1


def image_id(cfg: SynthConfig, i: int) -> str:
    return f"img-{cfg.seed}-{i:08d}"


def url_of_index(cfg: SynthConfig, i: int) -> str:
    h = int(host_of_index(cfg, np.array([i]))[0])
    return f"http://host{h}.test/p/{i % cfg.n_path_buckets}/{image_id(cfg, i)}"


def _caption_tokens(cfg: SynthConfig, i: int, vocab: np.ndarray) -> list:
    """Caption of page i; ~1/37 pages are near-dups of page i-1 (last token
    swapped → 4-gram Jaccard ≥ 0.9 for typical lengths, shingles.clj:31-36)."""
    is_dup = int(_r(cfg, np.array([i], dtype=np.int64), 4)[0] % np.uint64(37)) == 0 and i > 0
    e = i - 1 if is_dup else i
    length = 8 + int(_r(cfg, np.array([e], dtype=np.int64), 3)[0] % np.uint64(25))
    base = _r(cfg, np.array([e], dtype=np.int64), 5)[0]
    with np.errstate(over="ignore"):
        offsets = base + np.arange(length, dtype=np.uint64)
    toks = vocab[(mix64_np(offsets) % np.uint64(512)).astype(np.int64)].tolist()
    if is_dup:
        toks[-1] = vocab[int(_r(cfg, np.array([i], dtype=np.int64), 6)[0] % np.uint64(512))]
    return toks


def _phash_grid(pix: np.ndarray, n: int, h: int, w: int) -> np.ndarray:
    """(n, h, w) uint8 → int64 phash per row: 8x8 block means thresholded
    at the per-image mean (analog of the reference's structural page
    signature, page.clj:79-84, as a 64-bit image signature)."""
    bh, bw = h // 8, w // 8
    blocks = pix.reshape(n, 8, bh, 8, bw).mean(axis=(2, 4))  # (n, 8, 8)
    thresh = pix.reshape(n, -1).mean(axis=1)[:, None, None]
    bits = (blocks > thresh).reshape(n, 64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)


def gen_batch(cfg: SynthConfig, idx: np.ndarray) -> pd.DataFrame:
    """Generate corpus rows for page indices *idx* (vectorized numpy)."""
    idx = np.asarray(idx, dtype=np.int64)
    n = len(idx)
    vocab = _vocab(cfg)
    bounds = cfg.host_bounds
    hosts = host_of_index(cfg, idx)
    dims = np.array(cfg.dims, dtype=np.int64)

    # ~1/37 pages are near-dups of page i-1 (same rule as captions,
    # _caption_tokens): their image copies i-1's dims/fmt/pixels, so the
    # phash near-dup family has real planted positives
    dup = (_r(cfg, idx, 4) % np.uint64(37) == 0) & (idx > 0)
    eidx = np.where(dup, idx - 1, idx)
    w = dims[(_r(cfg, eidx, 7) % np.uint64(len(dims))).astype(np.int64)]
    h = dims[(_r(cfg, eidx, 8) % np.uint64(len(dims))).astype(np.int64)]
    fmt = np.where(_r(cfg, eidx, 9) % np.uint64(4) == 0, "png", "jpeg")

    ids = [image_id(cfg, int(i)) for i in idx]
    urls = [
        f"http://host{ho}.test/p/{int(i) % cfg.n_path_buckets}/{iid}"
        for i, ho, iid in zip(idx, hosts, ids)
    ]

    # pixels: flat vectorized generation across all rows of this batch
    blobs: list = [None] * n
    phashes = np.zeros(n, dtype=np.int64)
    if cfg.with_images:
        sizes = (w * h).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(sizes)])
        total = int(starts[-1])
        row_of = np.repeat(np.arange(n), sizes)
        local = np.arange(total, dtype=np.uint64) - starts[row_of].astype(np.uint64)
        base = _r(cfg, eidx, 10)[row_of]
        with np.errstate(over="ignore"):
            flat = (mix64_np(base + local) & np.uint64(0xFF)).astype(np.uint8)
        is_png = fmt == "png"
        payload = np.where(is_png[row_of], flat, flat & np.uint8(0xFE))
        # phash over DECODED pixels, grouped by (h, w) shape class
        for hh in cfg.dims:
            for ww in cfg.dims:
                sel = np.where((h == hh) & (w == ww))[0]
                if len(sel) == 0:
                    continue
                pix = np.stack(
                    [payload[starts[i] : starts[i] + hh * ww] for i in sel]
                ).reshape(len(sel), hh, ww)
                phashes[sel] = _phash_grid(pix, len(sel), hh, ww)
        pay_bytes = payload.tobytes()
        for j in range(n):
            header = (
                b"SGI1"
                + bytes([0 if is_png[j] else 1])
                + int(w[j]).to_bytes(2, "little")
                + int(h[j]).to_bytes(2, "little")
            )
            blobs[j] = header + pay_bytes[int(starts[j]) : int(starts[j + 1])]

    captions = [" ".join(_caption_tokens(cfg, int(i), vocab)) for i in idx]

    # out-links: pure function of (page index, link position)
    n_links = (_r(cfg, idx, 11) % np.uint64(cfg.link_max + 1)).astype(np.int64)
    link_base = _r(cfg, idx, 12)
    all_links = []
    for j in range(n):
        i = int(idx[j])
        ho = int(hosts[j])
        h_start, h_end = int(bounds[ho]), int(bounds[ho + 1])
        links = []
        for li in range(int(n_links[j])):
            with np.errstate(over="ignore"):
                rl = int(
                    mix64_np(
                        np.array([link_base[j] + np.uint64(li) * np.uint64(_K_LINK)])
                    )[0]
                )
            if (rl >> 16) % 13 == 0:
                href = "javascript:void(0)"
            else:
                if rl % 10 < 7 and h_end > h_start:  # same-host target
                    t = h_start + (rl >> 8) % (h_end - h_start)
                else:
                    t = (rl >> 8) % cfg.n_pages
                tid = image_id(cfg, t)
                t_host = int(host_of_index(cfg, np.array([t]))[0])
                t_path = f"/p/{t % cfg.n_path_buckets}/{tid}"
                form = (rl >> 40) % 5
                if form == 1:
                    href = t_path if t_host == ho else f"http://host{t_host}.test{t_path}"
                elif form == 2 and t % cfg.n_path_buckets == i % cfg.n_path_buckets and t_host == ho:
                    href = tid  # relative to the page's /p/<bucket>/ dir
                elif form == 3:
                    href = f"http://host{t_host}.test{t_path}#sec{rl % 7}"
                elif form == 4:
                    href = f"http://host{t_host}.test{t_path}#x&amp;y"
                else:
                    href = f"http://host{t_host}.test{t_path}"
                if (
                    cfg.with_aliases
                    and (rl >> 44) % 3 == 0
                    and int(_r(cfg, np.array([t], dtype=np.int64), 14)[0]) % 5 == 0
                ):
                    # target the page's redirect alias instead
                    href = f"http://host{t_host}.test/alias/{tid}"
            text = str((rl >> 28) % 20 + 1) if (rl >> 24) % 6 == 0 else str(
                vocab[(rl >> 12) % 512]
            )
            links.append(
                {
                    "href": href,
                    "text": text,
                    "xpath": XPATHS[(rl >> 32) % 6],
                    "nofollow": (rl >> 20) % 11 == 0,
                }
            )
        all_links.append(links)

    is_leaf = (_r(cfg, idx, 13) % np.uint64(3) == 0).tolist()

    if cfg.with_aliases:
        has_alias = (_r(cfg, idx, 14) % np.uint64(5) == 0)
        aliases = [
            [f"http://host{int(hosts[j])}.test/alias/{ids[j]}"] if has_alias[j] else []
            for j in range(n)
        ]
    else:
        aliases = [[] for _ in range(n)]

    return pd.DataFrame(
        {
            "image_id": ids,
            "bytes": blobs,
            "w": w.astype(np.int32),
            "h": h.astype(np.int32),
            "fmt": fmt,
            "caption": captions,
            "phash": phashes,
            "url": urls,
            "host": [f"host{ho}.test" for ho in hosts],
            "out_links": all_links,
            "is_leaf": is_leaf,
            "aliases": aliases,
        }
    )


def corpus_df(spark, cfg: SynthConfig, num_partitions: int | None = None):
    """Distributed corpus materialization: spark.range → mapInPandas.
    Each partition generates only its own index range — no driver funnel,
    scales to any n_pages by adding partitions/executors."""
    parts = num_partitions or spark.sparkContext.defaultParallelism
    rng = spark.range(0, cfg.n_pages, 1, parts)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield gen_batch(cfg, pdf["id"].to_numpy())

    out = rng.mapInPandas(gen, CORPUS_SCHEMA)
    # column presence signals the engine's redirect-resolution path; an
    # alias-free corpus must not pay for it (no probe scan either)
    return out if cfg.with_aliases else out.drop("aliases")


def gen_all(cfg: SynthConfig) -> pd.DataFrame:
    """Driver-side full corpus (oracle + small tests only)."""
    return gen_batch(cfg, np.arange(cfg.n_pages, dtype=np.int64))


def robots_rows(cfg: SynthConfig) -> list:
    """Per-host politeness rules, pure function of (seed, host). Delays
    mirror the reference's fixed sleeps {1000,2000,3000} ms
    (crawl.clj:83; utils.clj:25; gplus/core.clj:33)."""
    rows = []
    for ho in range(cfg.n_hosts):
        r = int(_r(cfg, np.array([ho], dtype=np.int64), 888)[0])
        delay = [1000, 2000, 3000][r % 3]
        disallow = []
        if r % 4 == 0:
            disallow = [f"/p/{(r >> 8) % cfg.n_path_buckets}/"]
        rows.append(
            {
                "host": f"host{ho}.test",
                "disallow_prefixes": disallow,
                "crawl_delay_ms": delay,
            }
        )
    return rows


def seed_urls(cfg: SynthConfig, k: int = 4) -> list:
    """Entry points: first page of each of the k largest hosts (analog of
    test_entry_points, test_system.clj:5-28)."""
    b = cfg.host_bounds
    return [url_of_index(cfg, int(b[ho])) for ho in range(min(k, cfg.n_hosts)) if b[ho] < b[ho + 1]]
