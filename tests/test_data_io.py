"""Dataset container, synthetic generator, checkpoint I/O, guards,
plotting smoke."""

import numpy as np
import pytest
import jax.numpy as jnp

from gaussian_processes_tpu.data import Dataset, synthetic_retina
from gaussian_processes_tpu.utils.guards import (
    is_posdef, is_symmetric, safe_log, safe_acos)
from gaussian_processes_tpu.utils.io import save_model, load_model
from gaussian_processes_tpu.config import FitConfig
from gaussian_processes_tpu.models.fit import fit


def small_ds():
    return synthetic_retina(n_px_side=12, n_train=40, n_val=10, n_test=6,
                            n_repeats=5, n_cells=3, seed=0)


def test_synthetic_retina_shapes():
    ds = small_ds()
    assert ds.images_train.shape == (40, 12, 12)
    assert ds.responses_train.shape == (40, 3)
    assert ds.responses_test.shape == (5, 6, 3)
    X, R = ds.full_train()
    assert X.shape == (50, 144)
    assert R.shape == (50, 3)
    imgs, resp = ds.test(averages=True)
    assert resp.shape == (6, 3)


def test_cell_selection_and_minibatch():
    ds = small_ds()
    ds.select_cells([1])
    _, r = ds.train()
    assert r.shape == (40, 1)
    ds.select_cells("all")
    xb, rb = ds.minibatch(8)
    assert xb.shape[0] == 8 and rb.shape[0] == 8
    seen = set()
    ds.next_epoch()
    for _ in range(5):
        xb, rb = ds.minibatch(8)
        seen.update(map(tuple, xb.reshape(8, -1)[:, :2].tolist()))
    assert len(seen) == 40  # full epoch coverage, no repeats


def test_dataset_pickle_roundtrip(tmp_path):
    ds = small_ds()
    p = str(tmp_path / "ds.pkl")
    ds.save(p)
    ds2 = Dataset.load(p)
    np.testing.assert_array_equal(ds.images_train, ds2.images_train)
    with pytest.raises(FileExistsError):
        ds.save(p)


@pytest.mark.slow
def test_model_save_load_roundtrip(tmp_path):
    ds = small_ds()
    X, R = ds.full_train()
    cfg = FitConfig(ntilde=X.shape[0], maxiter=3, n_estep=2, n_mstep=2,
                    n_fparamstep=3, n_px_side=12)
    res = fit(jnp.asarray(X, jnp.float64), jnp.asarray(R[:, 0], jnp.float64),
              cfg, xtilde=jnp.asarray(X, jnp.float64))
    d = str(tmp_path / "model_dir")
    desc = save_model(res, d, additional_description="r2 = test")
    assert "r2 = test" in desc
    loaded = load_model(d)
    np.testing.assert_allclose(np.asarray(loaded.m_b), np.asarray(res.m_b))
    np.testing.assert_allclose(np.asarray(loaded.V_b), np.asarray(res.V_b))
    assert loaded.config.maxiter == 3
    for k in res.theta:
        np.testing.assert_allclose(np.asarray(loaded.theta[k]),
                                   np.asarray(res.theta[k]))
    # refusal on existing directory (reference: utils.py:54-57)
    with pytest.raises(ValueError):
        save_model(res, d)
    # loaded model predicts identically
    from gaussian_processes_tpu.models.inference import predict
    xs = jnp.asarray(np.asarray(ds.images_test).reshape(6, -1), jnp.float64)
    r1, _, _ = predict(res, xs)
    r2, _, _ = predict(loaded, xs)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-12)


def test_guards():
    A = np.eye(3)
    assert is_posdef(A)
    assert is_symmetric(A)
    with pytest.warns(UserWarning):
        assert not is_symmetric(np.array([[1.0, 2.0], [0.0, 1.0]]))
    with pytest.warns(UserWarning):
        assert not is_posdef(np.array([[1.0, 0.0], [0.0, -1.0]]))
    with pytest.raises(ValueError):
        safe_log(jnp.asarray([-1.0]))
    with pytest.raises(ValueError):
        safe_log(jnp.asarray([1e-12]))
    assert np.isfinite(float(safe_acos(jnp.asarray(1.5))))


@pytest.mark.slow
def test_plotting_smoke(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from gaussian_processes_tpu.utils.plotting import (
        plot_training_dashboard, plot_fit, plot_receptive_field)
    ds = small_ds()
    X, R = ds.full_train()
    cfg = FitConfig(ntilde=X.shape[0], maxiter=3, n_estep=2, n_mstep=2,
                    n_fparamstep=3, n_px_side=12)
    res = fit(jnp.asarray(X, jnp.float64), jnp.asarray(R[:, 0], jnp.float64),
              cfg, xtilde=jnp.asarray(X, jnp.float64))
    fig = plot_training_dashboard(res)
    fig.savefig(str(tmp_path / "dash.png"))
    fig2 = plot_fit(np.ones(6), np.ones((5, 6)), 0.5, 0.1)
    fig2.savefig(str(tmp_path / "fit.png"))
    fig3 = plot_receptive_field(res)
    fig3.savefig(str(tmp_path / "rf.png"))


@pytest.mark.slow
def test_metrics_logger(tmp_path):
    import json
    from gaussian_processes_tpu.utils.metrics import (
        MetricsLogger, iteration_records)
    ds = small_ds()
    X, R = ds.full_train()
    cfg = FitConfig(ntilde=X.shape[0], maxiter=3, n_estep=2, n_mstep=0,
                    n_fparamstep=2, n_px_side=12)
    res = fit(jnp.asarray(X, jnp.float64), jnp.asarray(R[:, 0], jnp.float64),
              cfg, xtilde=jnp.asarray(X, jnp.float64))
    recs = iteration_records(res)
    assert len(recs) == 3
    assert "theta.eps_0x" in recs[0]
    p = str(tmp_path / "metrics.jsonl")
    with MetricsLogger(p) as ml:
        ml.log_fit(res)
        ml.log(event="done", r2=0.5)
    lines = [json.loads(l) for l in open(p)]
    assert len(lines) == 4
    assert lines[-1]["event"] == "done"


def test_phase_timer():
    import time as _t
    from gaussian_processes_tpu.utils.tracing import PhaseTimer
    pt = PhaseTimer()
    with pt.phase("a"):
        _t.sleep(0.01)
    with pt.phase("a"):
        _t.sleep(0.01)
    with pt.phase("b"):
        pass
    assert pt.counts["a"] == 2
    assert pt.totals["a"] >= 0.02
    assert "a" in pt.summary()


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path):
    from gaussian_processes_tpu.utils.io import (save_model_orbax,
                                                 load_model_orbax)
    ds = small_ds()
    X, R = ds.full_train()
    cfg = FitConfig(ntilde=X.shape[0], maxiter=3, n_estep=2, n_mstep=2,
                    n_fparamstep=3, n_px_side=12)
    res = fit(jnp.asarray(X, jnp.float64), jnp.asarray(R[:, 0], jnp.float64),
              cfg, xtilde=jnp.asarray(X, jnp.float64))
    d = str(tmp_path / "orbax_model")
    save_model_orbax(res, d)
    loaded = load_model_orbax(d)
    np.testing.assert_allclose(np.asarray(loaded.m_b), np.asarray(res.m_b))
    np.testing.assert_allclose(np.asarray(loaded.V_b), np.asarray(res.V_b))
    assert loaded.config.maxiter == 3
    from gaussian_processes_tpu.models.inference import predict
    xs = jnp.asarray(np.asarray(ds.images_test).reshape(6, -1), jnp.float64)
    r1, _, _ = predict(res, xs)
    r2, _, _ = predict(loaded, xs)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-12)


def test_synthetic_retina_hard_disk_cache(tmp_path, monkeypatch):
    """The hard-regime generator's disk cache must round-trip the full
    Dataset including the ground-truth attachments, and distinct
    parameters must not collide (the key covers every generator arg)."""
    from gaussian_processes_tpu.data import synthetic_retina_hard

    monkeypatch.setenv("GPTPU_DATA_CACHE", str(tmp_path / "dc"))
    kw = dict(n_px_side=16, n_train=30, n_val=8, n_test=5, n_repeats=4,
              n_cells=2, seed=3)
    ds1 = synthetic_retina_hard(**kw)
    files = list((tmp_path / "dc").glob("retina_hard_*.pkl"))
    assert len(files) == 1
    ds2 = synthetic_retina_hard(**kw)          # served from disk
    np.testing.assert_array_equal(ds1.images_train, ds2.images_train)
    np.testing.assert_array_equal(ds1.responses_test, ds2.responses_test)
    np.testing.assert_array_equal(ds1.ground_truth_rates_test,
                                  ds2.ground_truth_rates_test)
    np.testing.assert_array_equal(ds1.ground_truth_rfs, ds2.ground_truth_rfs)
    # a different seed is a different cache entry, not a stale hit
    ds3 = synthetic_retina_hard(**{**kw, "seed": 4})
    assert len(list((tmp_path / "dc").glob("retina_hard_*.pkl"))) == 2
    assert not np.array_equal(ds1.images_train, ds3.images_train)
    # disabling the cache bypasses disk entirely
    monkeypatch.setenv("GPTPU_DATA_CACHE", "")
    ds4 = synthetic_retina_hard(**kw)
    np.testing.assert_array_equal(ds1.images_train, ds4.images_train)
    assert len(list((tmp_path / "dc").glob("retina_hard_*.pkl"))) == 2
