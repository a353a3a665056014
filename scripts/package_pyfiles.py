"""Build the --py-files artifact for cluster deployment.

North-rule deployment shape: ``spark-submit --py-files
crawler_spark.zip crawler_spark/cli.py crawl ...`` — executors unpack
the zip onto their PYTHONPATH, so every ``mapInPandas``/``applyInPandas``
closure that references ``crawler_spark.*`` resolves on the worker side
without a shared filesystem. The zip contains only the package (no
tests, no scripts, no checkpoints).

Usage: python scripts/package_pyfiles.py [out.zip]   (default
build/crawler_spark.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg = os.path.join(REPO, "crawler_spark")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                arc = os.path.relpath(full, REPO)
                z.write(full, arc)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "build", "crawler_spark.zip"
    )
    print(build(out))
