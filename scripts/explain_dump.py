"""Dump `.explain("formatted")` for named queries() entries to text files.

Used to produce the per-round plan evidence the judge checks
(`plans/rNN/<query>_{before,after}.txt`): run once from a worktree at the
prior round's HEAD with suffix `before`, once at current HEAD with
suffix `after`.

    python scripts/explain_dump.py <out_dir> <suffix> <name>[,<name>...] [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sql_to_ibis_spark.session import get_spark


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = [n for n in sys.argv[3].split(",") if n]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') @ {sf_dir}\n")
            f.write(buf.getvalue())
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
