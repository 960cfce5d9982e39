"""Build dist/sparkdu.zip for spark-submit --py-files (SURVEY SS7 M9).

The zip ships the sparkdu package plus the frozen artifacts/ directory (the
classifier weights must reach executors; artifact files are read from the
zip-extracted path via SparkFiles or shipped separately with --files on a
real cluster — locally the absolute path works).

Run: python tools/build_dist.py
Smoke: spark-submit --master 'local[4]' --py-files dist/sparkdu.zip \
    sparkdu/jobs/extract_job.py --input fixtures_data/pages.parquet \
    --output /tmp/sparkdu_submit --run-id smoke
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "sparkdu.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "sparkdu")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, REPO))
        art = os.path.join(REPO, "artifacts")
        if os.path.isdir(art):
            for fn in sorted(os.listdir(art)):
                z.write(os.path.join(art, fn), f"artifacts/{fn}")
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
