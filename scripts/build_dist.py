"""Build dist/deepie_spark.zip for spark-submit --py-files."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from deepie_spark.session import build_pyfiles_zip

if __name__ == "__main__":
    out = Path(__file__).resolve().parent.parent / "dist" / "deepie_spark.zip"
    out.parent.mkdir(exist_ok=True)
    print(build_pyfiles_zip(str(out)))
