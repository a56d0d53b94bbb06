"""Dump ``explain("formatted")`` for every declared query to files.

Usage: python scripts/dump_plans.py <out_dir> [sf_dir] [query ...]

Used by the optimization rounds to record before/after physical plans
(``plans/rNN/<query>_{before,after}.txt``): run it once from the
round-start tree (e.g. a git worktree of the baseline commit) and once
from the optimized tree.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    out_dir.mkdir(parents=True, exist_ok=True)

    from deepie_spark.session import get_spark

    spark = get_spark(app_name="plan_dump")
    suffix = os.environ.get("DEEPIE_PLAN_SUFFIX", "")
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # record the failure instead of dying
            text = f"PLAN DUMP ERROR: {e}\n"
        (out_dir / f"{name}{suffix}.txt").write_text(text)
        print(f"{name}: {len(text)} bytes", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
