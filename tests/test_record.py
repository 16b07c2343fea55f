"""Record/RecordStorage/Recorder tests (≙ border-core record semantics)."""

import numpy as np
import pytest

from border_tpu.record import BufferedRecorder, NullRecorder, Record
from border_tpu.record.record import RecordStorage


def test_record_merge_right_biased():
    a = Record({"x": 1.0, "y": 2.0})
    b = Record({"y": 3.0, "z": 4.0})
    m = a.merge(b)
    assert m.get_scalar("x") == 1.0
    assert m.get_scalar("y") == 3.0  # right wins (base.rs:166-186)
    assert m.get_scalar("z") == 4.0


def test_record_typed_getters():
    r = Record({"s": 1.5, "arr": np.zeros((2, 3)), "name": "run1"})
    assert r.get_scalar("s") == 1.5
    assert r.get_array("arr").shape == (2, 3)
    assert r.get_string("name") == "run1"
    with pytest.raises(TypeError):
        r.get_scalar("name")
    with pytest.raises(KeyError):
        r.get_scalar("missing")


def test_get_scalar_without_key():
    assert Record({"only": 7.0}).get_scalar_without_key() == 7.0
    with pytest.raises(ValueError):
        Record({"a": 1.0, "b": 2.0}).get_scalar_without_key()


def test_storage_aggregation():
    """Scalars with >1 values → min/max/mean/median (storage.rs:284-307)."""
    st = RecordStorage()
    for v in [1.0, 2.0, 3.0, 10.0]:
        st.store(Record({"loss": v, "tag": "latest"}))
    st.store(Record({"single": 5.0}))
    agg = st.aggregate()
    assert agg.get_scalar("loss_min") == 1.0
    assert agg.get_scalar("loss_max") == 10.0
    assert agg.get_scalar("loss_mean") == 4.0
    assert agg.get_scalar("loss_median") == 2.5
    assert agg.get_scalar("single") == 5.0  # single value passes through
    assert agg.get_string("tag") == "latest"  # non-scalar keeps latest
    # storage cleared after aggregate
    assert len(st) == 0


def test_buffered_recorder_flush():
    rec = BufferedRecorder()
    rec.store(Record({"loss": 1.0}))
    rec.store(Record({"loss": 3.0}))
    rec.flush(step=10)
    assert len(rec.records) == 1
    assert rec.records[0].get_scalar("loss_mean") == 2.0
    assert rec.records[0].get_scalar("opt_steps") == 10.0


def test_null_recorder_noop():
    rec = NullRecorder()
    rec.store(Record({"x": 1.0}))
    rec.write(Record({"x": 1.0}))
    rec.flush(1)  # must not raise


def test_tensorboard_recorder(tmp_path):
    from border_tpu.record import TensorboardRecorder

    rec = TensorboardRecorder(str(tmp_path / "tb"))
    rec.store(Record({"loss": 1.0}))
    rec.store(Record({"loss": 2.0}))
    rec.flush(5)
    rec.close()
    import glob

    assert glob.glob(str(tmp_path / "tb" / "events.*"))


def test_tfevent_writer_readable_by_tensorboard(tmp_path):
    """The stdlib TFRecord/proto writer must produce files the official
    tensorboard reader parses (crc32c masking, varint framing, Summary
    protos) — format-level round-trip."""
    import numpy as np

    from border_tpu.record.tfevent import TFEventWriter

    w = TFEventWriter(str(tmp_path))
    w.add_scalar("loss", 0.5, step=3)
    w.add_scalar("loss", 0.25, step=4)
    w.add_image("frame", np.arange(12.0).reshape(3, 4), step=4)
    w.add_histogram("weights", np.random.RandomState(0).randn(100), step=4)
    w.close()

    import glob

    from tensorboard.backend.event_processing import event_file_loader

    path = glob.glob(str(tmp_path / "events.*"))[0]
    events = list(event_file_loader.LegacyEventFileLoader(path).Load())
    assert events[0].file_version == "brain.Event:2"
    scalars = [
        (e.step, v.tag, v.simple_value)
        for e in events
        for v in e.summary.value
        if v.HasField("simple_value")
    ]
    assert (3, "loss", 0.5) in scalars and (4, "loss", 0.25) in scalars
    images = [v for e in events for v in e.summary.value if v.HasField("image")]
    assert images and images[0].image.height == 3 and images[0].image.width == 4
    assert images[0].image.encoded_image_string.startswith(b"\x89PNG")
    histos = [v for e in events for v in e.summary.value if v.HasField("histo")]
    assert histos and histos[0].histo.num == 100.0


def test_unified_error_surface():
    """≙ LrrError (border-core/src/error.rs:1-14): one catchable hierarchy,
    compatible with the builtin KeyError/TypeError idioms."""
    import pytest

    from border_tpu import BorderTpuError, RecordKeyError, RecordValueTypeError
    from border_tpu.record.record import Record

    r = Record({"a": 1.0, "s": "text"})
    with pytest.raises(RecordKeyError):
        r.get_scalar("missing")
    with pytest.raises(KeyError):  # builtin-compatible
        r.get_scalar("missing")
    with pytest.raises(RecordValueTypeError):
        r.get_scalar("s")
    with pytest.raises(BorderTpuError):
        r.get_string("a")

    from border_tpu.record.mlflow import MlflowError

    assert issubclass(MlflowError, BorderTpuError)
