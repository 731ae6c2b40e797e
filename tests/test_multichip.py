"""Multi-chip sharding validation on the 8-device virtual CPU mesh."""
import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    screen = jax.jit(fn)(*args)
    arr = np.asarray(screen)
    assert arr.shape == (120, 160)
    # terrain scene from above: most pixels are terrain, not skybox
    assert np.mean(arr != np.uint32(0xFF191919)) > 0.3
