"""Rolling checkpoint, auto-resume, SYNTHIA ignore-class metrics, and mesh
auto-sizing."""

import jax
import jax.numpy as jnp
import numpy as np

from dasac_tpu.core.state import create_train_state
from dasac_tpu.nn.factory import build_model
from dasac_tpu.train.checkpoints import Checkpointer, NullTx
from dasac_tpu.train.loop import _auto_mesh_size
from dasac_tpu.train.metrics import mean_iou


def _state():
    model = build_model("tiny", 4)
    return model, create_train_state(model, NullTx(), 4, (16, 16, 3))


def test_save_latest_roundtrip(tmp_path):
    model, state = _state()
    ck = Checkpointer(str(tmp_path))
    assert ck.latest_path() is None
    state = state.replace(running_conf=jnp.asarray([1., 2., 3., 4.]))
    fn = ck.save_latest(state, 0.5, 7)
    assert ck.latest_path() == fn
    # overwrite is atomic and picks up new values
    state2 = state.replace(running_conf=jnp.asarray([9., 9., 9., 9.]))
    ck.save_latest(state2, 0.7, 8)
    _, loaded = _state()
    loaded, epoch, score = ck.load(ck.latest_path(), loaded)
    assert epoch == 8 and abs(score - 0.7) < 1e-9
    np.testing.assert_allclose(np.asarray(loaded.running_conf), 9.0)


def test_best_pruning(tmp_path):
    import os

    model, state = _state()
    ck = Checkpointer(str(tmp_path), max_n=2)
    for e, s in [(1, 0.1), (2, 0.2), (3, 0.3)]:
        ck.save(state, s, e)
    ckpts = [f for f in os.listdir(tmp_path) if f.endswith(".ckpt")]
    assert len(ckpts) == 2
    assert not any("epoch001" in f for f in ckpts)


def test_mean_iou_ignore_class():
    """SYNTHIA 16-class protocol: ignored classes drop out of the mean
    (reference train.py:447-449, VAL.IGNORE_CLASS [9,14,16])."""
    c = 19
    conf = np.zeros((c, c))
    for i in range(c):
        conf[i, i] = 10  # perfect
    conf[9, 9] = 0   # class 9 absent -> IoU 0 drags the 19-class mean
    assert mean_iou(conf) < 1.0
    assert mean_iou(conf, ignore_class=(9, 14, 16)) > 0.99


def test_auto_mesh_size():
    assert _auto_mesh_size(8, 8, 2) == 2
    assert _auto_mesh_size(8, 8, 8) == 8
    assert _auto_mesh_size(8, 12, 8) == 4
    assert _auto_mesh_size(1, 8, 8) == 1
    assert _auto_mesh_size(8, 7, 5) == 1
