"""Build linkgraph.zip for spark-submit --py-files (SURVEY.md §3.2)."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = os.path.join(REPO, "linkgraph.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, "linkgraph")):
            for name in files:
                if name.endswith(".py"):
                    path = os.path.join(root, name)
                    zf.write(path, os.path.relpath(path, REPO))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
