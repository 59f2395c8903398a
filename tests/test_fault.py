"""Fault-tolerant tile-retry rendering (parallel/fault.py): band assembly
matches the monolithic render, injected faults are retried exactly, and
exhausted retries raise."""
import numpy as np
import pytest

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.parallel import fault


def _cfg():
    return cnr.RenderConfig(width=16, height=16, scene="sphere", max_steps=64)


def test_tiled_matches_monolithic():
    cfg = _cfg()
    cam = cnr.Camera(rotation_y=30.0)
    whole = np.asarray(cnr.render_image(None, cam, cfg))
    tiled = fault.render_tiled(None, cam, cfg, n_bands=4)
    np.testing.assert_allclose(tiled, whole, atol=1e-6)


def test_injected_fault_is_retried():
    cfg = _cfg()
    inj = fault.FaultInjector(fail_times=2)
    tiled = fault.render_tiled(None, cnr.Camera(), cfg, n_bands=4, injector=inj)
    whole = np.asarray(cnr.render_image(None, cnr.Camera(), cfg))
    assert inj.injected == 2
    np.testing.assert_allclose(tiled, whole, atol=1e-6)


def test_retries_exhausted_raises():
    cfg = _cfg()
    inj = fault.FaultInjector(fail_times=100)
    with pytest.raises(RuntimeError, match="failed .* times"):
        fault.render_tiled(None, cnr.Camera(), cfg, n_bands=2, max_retries=2,
                           injector=inj)


def test_neural_bands(plane1_params):
    cfg = cnr.RenderConfig(width=16, height=16, scene="neural_raw", max_steps=128)
    cam = cnr.Camera(rotation_y=45.0)
    whole = np.asarray(cnr.render_image(plane1_params, cam, cfg))
    tiled = fault.render_tiled(plane1_params, cam, cfg, n_bands=2)
    np.testing.assert_allclose(tiled, whole, atol=1e-6)
