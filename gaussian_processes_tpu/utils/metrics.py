"""Metrics / observability: structured per-iteration records.

The reference tracks everything in an in-memory ``values_track`` dict and
prints the loss per iteration (Spatial_GP_repo/utils.py:1713-1727,
1969-1991).  Here the compiled fit returns the same history as device arrays
(models/fit.py Track); this module turns it into structured records and
optionally streams them as JSONL for external dashboards.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


def iteration_records(result) -> List[Dict]:
    """One flat dict per EM iteration from a FitResult."""
    t = result.track
    n = len(np.asarray(t.logmarginal))
    recs = []
    for i in range(n):
        rec = {
            "iteration": i,
            "logmarginal": float(t.logmarginal[i]),
            "loglikelihood": float(t.loglikelihood[i]),
            "KL": float(t.KL[i]),
            "logA": float(t.logA[i]),
            "lambda0": float(t.lambda0[i]),
            "n_eigen": int(t.n_eigen[i]),
        }
        for k, v in t.theta.items():
            rec[f"theta.{k}"] = float(v[i])
        recs.append(rec)
    return recs


class MetricsLogger:
    """Append-only JSONL metrics stream (one object per call)."""

    def __init__(self, path: Optional[str] = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a")

    def log(self, **metrics):
        rec = {k: (float(v) if isinstance(v, (np.floating, np.integer))
                   else v) for k, v in metrics.items()}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.echo:
            print(" ".join(f"{k}={v}" for k, v in rec.items()))
        return rec

    def log_fit(self, result, prefix: str = ""):
        for rec in iteration_records(result):
            if prefix:
                rec = {f"{prefix}{k}": v for k, v in rec.items()}
            self.log(**rec)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
