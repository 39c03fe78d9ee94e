"""TensorBoard event-format writer (xdiffusion_tpu/tensorboard.py): the
hand-encoded TFRecord/Event stream must load in the stock tensorboard
reader (the ecosystem contract — reference logs via
torch.utils.tensorboard, training/image/train.py:90-95)."""

import numpy as np
import pytest

from xdiffusion_tpu.tensorboard import TensorBoardWriter, crc32c


def test_crc32c_known_answers():
    # RFC 3720 / iSCSI test vectors for the Castagnoli polynomial.
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"") == 0


def test_events_load_in_stock_tensorboard(tmp_path):
    ea = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator"
    )
    d = str(tmp_path / "tb")
    w = TensorBoardWriter(d)
    for step, val in enumerate([1.0, 0.5, 0.25]):
        w.add_scalar("loss", val, step)
    w.add_scalar("grad_norm", 3.0, 2)
    w.add_image("grid", np.random.default_rng(0).random((16, 16, 1)), 2)
    w.close()

    acc = ea.EventAccumulator(d)
    acc.Reload()
    scalars = acc.Scalars("loss")
    assert [s.step for s in scalars] == [0, 1, 2]
    np.testing.assert_allclose(
        [s.value for s in scalars], [1.0, 0.5, 0.25]
    )
    assert acc.Scalars("grad_norm")[0].value == 3.0
    imgs = acc.Images("grid")
    assert len(imgs) == 1 and imgs[0].width == 16 and imgs[0].height == 16


def test_metrics_logger_writes_tb_events(tmp_path, monkeypatch):
    ea = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator"
    )
    monkeypatch.setenv("XDIFFUSION_TENSORBOARD", "1")
    import os

    from xdiffusion_tpu.training.common import MetricsLogger

    out = str(tmp_path / "run")
    logger = MetricsLogger(out)
    logger.log(0, {"loss": 2.0})
    logger.log(50, {"loss": 1.0})
    logger.log_image_grid(
        "samples", np.random.default_rng(0).random((4, 8, 8, 1)), 50
    )
    logger.close()

    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    acc = ea.EventAccumulator(os.path.join(out, "tensorboard"))
    acc.Reload()
    assert [s.step for s in acc.Scalars("loss")] == [0, 50]
    assert len(acc.Images("samples")) == 1
