"""Capture .explain('formatted') for declared queries into plans/r07/.

Usage: python tools/capture_plan.py <before|after> <query> [<query> ...]
Writes plans/r07/<query>_<tag>.txt. Uses sf0.01 (plan shape is scale-
independent; AQE initial plans are shown). Queries come from
__spark_entry__.queries() plus retired_queries().
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from streetview_naturevisibility_spark.session import get_spark


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entrymod.retired_queries(), **entrymod.queries())
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt ({len(buf.getvalue())} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
