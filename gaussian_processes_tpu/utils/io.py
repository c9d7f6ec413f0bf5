"""Checkpoint I/O: save/load fitted models.

Mirrors the reference's pickle-based persistence
(Spatial_GP_repo/utils.py:46-109, 312-324): a ``model`` pickle plus a
human-readable ``metadata`` description in a directory that must not already
exist.  Device arrays are converted to numpy for portability; loading
reconstructs a FitResult whose arrays re-materialize on the default device
lazily.  A loaded model feeds straight back into ``fit`` (warm start) or the
active loop — the reference's resume path (utils.py:1674-1704).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from datetime import datetime

import numpy as np
import jax

from ..config import FitConfig
from ..params import logbetaexpr_to_beta, logrhoexpr_to_rho


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def describe(result) -> str:
    t = result.track
    cfg = result.config
    lines = [
        "Model Description:",
        f"  cellid:   {cfg.cellid}",
        f"  ntilde:   {cfg.ntilde}",
        f"  maxiter:  {cfg.maxiter}  nEstep: {cfg.n_estep}  "
        f"nMstep: {cfg.n_mstep}  nFparamstep: {cfg.n_fparamstep}",
        f"  eigval_tol: {cfg.eigval_tol}  min_tolerance: {cfg.min_tolerance}",
        "",
        "Hyperparameters (start -> end):",
    ]
    for k, v in t.theta.items():
        lines.append(f"  {k:<12}: {float(v[0]):>10.4f} -> "
                     f"{float(v[-1]):>10.4f}")
    lines += [
        f"  beta        : {float(logbetaexpr_to_beta(t.theta['-2log2beta'][0])):>10.4f} -> "
        f"{float(logbetaexpr_to_beta(t.theta['-2log2beta'][-1])):>10.4f}",
        f"  rho         : {float(logrhoexpr_to_rho(t.theta['-log2rho2'][0])):>10.4f} -> "
        f"{float(logrhoexpr_to_rho(t.theta['-log2rho2'][-1])):>10.4f}",
        "",
        f"  logA        : {float(t.logA[0]):>10.4f} -> {float(t.logA[-1]):>10.4f}",
        f"  lambda0     : {float(t.lambda0[0]):>10.4f} -> {float(t.lambda0[-1]):>10.4f}",
        f"  loss        : {-float(t.logmarginal[0]):>10.4f} -> "
        f"{-float(t.logmarginal[-1]):>10.4f}",
        f"  failed      : {result.failed} (at iteration {result.failed_at})",
    ]
    return "\n".join(lines)


def save_model(result, directory: str, additional_description: str = None):
    """Refuses an existing directory, exactly like the reference
    (utils.py:54-57)."""
    if os.path.exists(directory):
        raise ValueError(f"Directory {directory} already exists")
    os.makedirs(directory)

    description = describe(result)
    if additional_description:
        description += f"\n\n{additional_description}"

    payload = dataclasses.asdict(result)
    cfg_dict = payload.pop("config")        # keep native python scalars
    payload = _to_numpy(payload)
    payload["config"] = cfg_dict
    payload["__description__"] = description
    payload["__saved_at__"] = datetime.now().isoformat()

    with open(os.path.join(directory, "model"), "wb") as f:
        pickle.dump(payload, f)
    with open(os.path.join(directory, "metadata"), "w") as f:
        f.write(description)
    return description


def load_model(directory: str):
    """Load a FitResult saved by save_model."""
    from ..models.fit import FitResult, Track

    with open(os.path.join(directory, "model"), "rb") as f:
        payload = pickle.load(f)
    payload.pop("__description__", None)
    payload.pop("__saved_at__", None)
    cfg = payload.pop("config")
    if isinstance(cfg, dict):
        cfg = FitConfig(**cfg)
    track = payload.pop("track")
    if isinstance(track, dict):
        track = Track(**track)
    return FitResult(config=cfg, track=track, **payload)


# ---------------------------------------------------------------------------
# Orbax checkpointing (TPU-native, async-capable, multi-host-safe)
# ---------------------------------------------------------------------------

def save_model_orbax(result, directory: str,
                     additional_description: str = None):
    """Save via orbax-checkpoint: the array pytree goes through Orbax's
    sharded/async-capable writer (the idiomatic TPU checkpoint path); config
    and metadata ride alongside as JSON/text."""
    import json

    import orbax.checkpoint as ocp

    if os.path.exists(directory):
        raise ValueError(f"Directory {directory} already exists")
    os.makedirs(directory)
    directory = os.path.abspath(directory)

    description = describe(result)
    if additional_description:
        description += f"\n\n{additional_description}"

    payload = dataclasses.asdict(result)
    cfg_dict = payload.pop("config")
    payload.pop("timing", None)
    arrays = {k: v for k, v in payload.items()
              if k not in ("theta_lower", "theta_upper", "failed",
                           "failed_at", "used_warm_basis")}
    # Orbax refuses zero-size arrays (e.g. the track's empty m_b/V_b/B
    # slots when tracking is off): prune them and record their
    # shape/dtype so load reconstructs the exact pytree.
    import jax.tree_util as jtu

    def _path_keys(kp):
        return [str(getattr(e, "key", getattr(e, "name",
                                              getattr(e, "idx", e))))
                for e in kp]

    flat, treedef = jtu.tree_flatten_with_path(arrays)
    empty = [( _path_keys(kp), list(np.shape(v)),
               str(np.asarray(v).dtype))
             for kp, v in flat if np.size(v) == 0]
    arrays = jtu.tree_map(
        lambda v: None if np.size(v) == 0 else v, arrays)
    scalars = {"failed": bool(payload["failed"]),
               "failed_at": int(payload["failed_at"]),
               "used_warm_basis": bool(payload.get("used_warm_basis",
                                                   False)),
               "theta_lower": payload["theta_lower"],
               "theta_upper": payload["theta_upper"],
               "empty_arrays": empty,
               "config": cfg_dict}

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(directory, "arrays"), arrays)
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump(scalars, f)
    with open(os.path.join(directory, "metadata"), "w") as f:
        f.write(description)
    return description


def load_model_orbax(directory: str):
    """Load a FitResult saved by save_model_orbax."""
    import json

    import orbax.checkpoint as ocp

    from ..models.fit import FitResult, Track

    directory = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        arrays = ckptr.restore(os.path.join(directory, "arrays"))
    with open(os.path.join(directory, "meta.json")) as f:
        scalars = json.load(f)
    cfg = FitConfig(**scalars["config"])
    # restore pruned zero-size arrays (see save_model_orbax); orbax
    # restores namedtuples as plain dicts, so every path entry is a dict key
    for parts, shape, dtype in scalars.get("empty_arrays", []):
        node = arrays
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = np.zeros(shape, dtype)
    track = arrays.pop("track")
    if isinstance(track, dict):
        track = Track(**track)
    return FitResult(config=cfg, track=track,
                     theta_lower=scalars["theta_lower"],
                     theta_upper=scalars["theta_upper"],
                     failed=scalars["failed"],
                     failed_at=scalars["failed_at"],
                     used_warm_basis=scalars.get("used_warm_basis", False),
                     **arrays)
