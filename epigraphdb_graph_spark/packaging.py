"""--py-files packaging.

The north_rule requires the job be runnable via ``spark-submit
--py-files`` on a multi-executor cluster: executor Python workers must be
able to import this package (the extraction pandas UDF pickles a reference
to ``epigraphdb_graph_spark.functions.extract``). ``build_pyfiles_zip``
produces that artifact; ``get_spark`` ships it automatically via
``sc.addPyFile`` so driver-launched sessions work from any cwd too.
"""

from __future__ import annotations

import os
import zipfile


def build_pyfiles_zip(dest: str | None = None) -> str:
    """Zip this package (sources only) for --py-files / addPyFile."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    if dest is None:
        dest = os.path.join(root, "dist", "epigraphdb_graph_spark.zip")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root)
                zf.write(full, rel)
    return dest


if __name__ == "__main__":
    print(build_pyfiles_zip())
