"""Command-line driver: ``python -m gaussian_processes_tpu <command>``.

The reference's user interface is a set of notebooks; this CLI exposes the
same workflows headlessly:

    fit         single-cell EM fit (examples/one_cell_fit.py flags)
    active      closed-loop active training (+ --ab-control)
    population  all-cells mesh fit
    bench       the headline benchmark
"""

from __future__ import annotations

import runpy
import os
import sys


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = sys.argv[1], sys.argv[2:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scripts = {
        "fit": os.path.join(root, "examples", "one_cell_fit.py"),
        "active": os.path.join(root, "examples", "active_training.py"),
        "population": os.path.join(root, "examples", "population_fit.py"),
        "bench": os.path.join(root, "bench.py"),
    }
    if cmd not in scripts:
        print(f"unknown command {cmd!r}; choose from {sorted(scripts)}")
        return 2
    sys.argv = [scripts[cmd]] + rest
    runpy.run_path(scripts[cmd], run_name="__main__")
    return 0


if __name__ == "__main__":
    sys.exit(main())
