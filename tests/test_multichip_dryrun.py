"""Multi-chip sharding dry-run on the 8-device virtual CPU mesh."""
import numpy as np


def test_dryrun_dp2_tp4():
    from lmdeploy_tpu.parallel.dryrun import dryrun_step
    toks = dryrun_step(8, dp=2, tp=4)
    assert toks.shape == (4,)


def test_dryrun_tp8():
    from lmdeploy_tpu.parallel.dryrun import dryrun_step
    toks = dryrun_step(8, dp=1, tp=8)
    assert toks.shape == (2,)


def test_tp_matches_single_device():
    """Sharded execution must be numerically consistent with tp=1."""
    from lmdeploy_tpu.parallel.dryrun import dryrun_step
    a = dryrun_step(8, dp=1, tp=1)
    b = dryrun_step(8, dp=1, tp=2)
    np.testing.assert_array_equal(a, b)


def test_dp_ep_tp_mesh():
    from lmdeploy_tpu.parallel.dryrun import dryrun_step
    toks = dryrun_step(8, dp=2, tp=2, ep=2)
    assert toks.shape == (4,)


def test_moe_ep_sharding():
    """Sparse-MoE step compiles and runs with experts sharded over 'ep'."""
    from lmdeploy_tpu.parallel.dryrun import dryrun_moe
    logits = dryrun_moe(8)
    assert np.isfinite(np.asarray(logits)).all()


def test_cp_dryrun():
    from lmdeploy_tpu.parallel.dryrun import dryrun_cp
    assert dryrun_cp(8)
