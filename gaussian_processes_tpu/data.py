"""Data layer: dataset container, host-side feed, synthetic generator.

Successor of the reference's ``Spatial_GP_repo/data.py`` Dataset (same
surface: train/val/test splits, cell selection, epoch-permuted minibatches,
pickle save/load) plus a synthetic retina generator that plants Gaussian
receptive fields and Poisson responses — used by tests and benchmarks since
the lab's pickle lives on their fileserver (data.py:6 hardcodes it).

The feed stays thin by design: stimuli go to device once as one array; the
fit programs are compiled over the whole set (no per-batch host round trips).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class Dataset:
    """Images are (n, px, px) or (n, px*px); responses are (n, ncells);
    test responses are (nrep, nimg, ncells) (reference: data.py:9-108,
    one_cell_fit.ipynb:cell4)."""

    images_train: np.ndarray
    responses_train: np.ndarray
    images_val: np.ndarray
    responses_val: np.ndarray
    images_test: np.ndarray
    responses_test: np.ndarray

    def __post_init__(self):
        self.num_neurons = self.responses_train.shape[1]
        self.num_train_samples = self.images_train.shape[0]
        self.px_y = self.images_train.shape[1]
        self.px_x = (self.images_train.shape[2]
                     if self.images_train.ndim > 2 else self.px_y)
        self._minibatch_idx = np.iinfo(np.int64).max
        self._train_perm = np.empty(0, np.int64)
        self.cell_selection: Optional[Sequence[int]] = None

    # ---- selection ----
    def get_cell_nbs(self):
        return list(range(self.num_neurons))

    def select_cells(self, selection):
        self.cell_selection = None if selection == "all" else selection

    def _select(self, responses):
        if self.cell_selection is not None:
            return responses[..., self.cell_selection]
        return responses

    # ---- splits ----
    def train(self):
        return self.images_train, self._select(self.responses_train)

    def val(self):
        return self.images_val, self._select(self.responses_val)

    def test(self, averages: bool = True):
        responses = self._select(self.responses_test)
        if averages:
            responses = responses.mean(axis=0)
        return self.images_test, responses

    def full_train(self) -> Tuple[np.ndarray, np.ndarray]:
        """train + val concatenated and flattened — the working set of the
        notebooks (one_cell_fit.ipynb:cell4)."""
        X = np.concatenate([self.images_train, self.images_val], axis=0)
        R = np.concatenate([self.responses_train, self.responses_val], axis=0)
        return X.reshape(X.shape[0], -1), R

    # ---- minibatching (epoch-permuted, reference: data.py:86-95) ----
    def minibatch(self, batch_size: int):
        if self._minibatch_idx + batch_size > self.num_train_samples:
            self.next_epoch()
        idx = self._train_perm[self._minibatch_idx
                               + np.arange(batch_size)]
        self._minibatch_idx += batch_size
        return self.images_train[idx], self.responses_train[idx]

    def next_epoch(self):
        self._minibatch_idx = 0
        self._train_perm = np.random.permutation(self.num_train_samples)

    # ---- persistence ----
    def save(self, data_file: str):
        if os.path.isfile(data_file):
            raise FileExistsError(data_file)
        with open(data_file, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(data_file: str) -> "Dataset":
        with open(data_file, "rb") as f:
            return pickle.load(f)


def synthetic_retina(n_px_side: int = 108, n_train: int = 2910,
                     n_val: int = 250, n_test: int = 30, n_repeats: int = 30,
                     n_cells: int = 41, gain: float = 0.8,
                     rf_sigma: float = 0.1, seed: int = 0) -> Dataset:
    """Plant Gaussian RFs and Poisson responses at the reference dataset's
    shapes (3,160 train+val images of 108x108, 41 cells, 30x30 test;
    one_cell_fit.ipynb:cell4)."""
    rng = np.random.default_rng(seed)
    lin = np.linspace(-1, 1, n_px_side)
    yy, xx = np.meshgrid(lin, lin, indexing="ij")

    centers = rng.uniform(-0.5, 0.5, (n_cells, 2))
    ws = np.stack([
        np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * rf_sigma ** 2)).ravel()
        for cx, cy in centers])
    ws /= np.linalg.norm(ws, axis=1, keepdims=True)

    def draw(n):
        X = rng.standard_normal((n, n_px_side, n_px_side)).astype(np.float32)
        lam = np.exp(gain * X.reshape(n, -1) @ ws.T)       # (n, ncells)
        return X, lam

    Xtr, lam_tr = draw(n_train)
    Xv, lam_v = draw(n_val)
    Xte, lam_te = draw(n_test)
    Rtr = rng.poisson(lam_tr).astype(np.float32)
    Rv = rng.poisson(lam_v).astype(np.float32)
    Rte = rng.poisson(
        np.broadcast_to(lam_te, (n_repeats, n_test, n_cells))).astype(np.float32)
    ds = Dataset(Xtr, Rtr, Xv, Rv, Xte, Rte)
    ds.ground_truth_rfs = ws
    ds.ground_truth_centers = centers
    return ds
