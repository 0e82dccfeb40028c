"""Tests for profiling/debugging/metrics utilities."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pde_superresolution_tpu.utils import debugging, profiling
from pde_superresolution_tpu.utils.metrics import MetricsLogger


class TestMetricsLogger:
    def test_writes_jsonl(self, tmp_path):
        path = str(tmp_path / "m.jsonl")
        logger = MetricsLogger(path)
        logger.log(1, loss=0.5, note="hi")
        logger.log(2, loss=jnp.asarray(0.25))
        logger.close()
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
        assert lines[0]["note"] == "hi"
        assert lines[1]["loss"] == 0.25

    def test_none_path_noop(self):
        logger = MetricsLogger(None)
        logger.log(1, x=1.0)  # must not raise
        logger.close()

    def test_tb_crc32c_known_vectors(self):
        """The TFRecord framing stands on crc32c; pin it to the published
        check value (RFC 3720 §B.4: crc32c('123456789') = 0xE3069283)."""
        from pde_superresolution_tpu.utils import tb_events

        assert tb_events._crc32c(b"123456789") == 0xE3069283
        assert tb_events._crc32c(b"") == 0
        # varint round-trip spot checks
        assert tb_events._varint(0) == b"\x00"
        assert tb_events._varint(300) == b"\xac\x02"

    def test_tensorboard_mirror(self, tmp_path):
        tb_dir = str(tmp_path / "tb")
        logger = MetricsLogger(
            str(tmp_path / "m.jsonl"), tensorboard_dir=tb_dir
        )
        logger.log(1, loss=0.5)
        logger.log(5, loss=0.25, note="skipped-non-float")
        logger.close()
        # read the event file with a minimal TFRecord-frame parse —
        # importing tensorboard's event_accumulator costs ~7s of suite wall
        # time; the writer's byte format was validated once against that
        # stock reader (CRCs + proto decode), see utils/tb_events.py
        import os
        import struct

        (event_file,) = [
            os.path.join(tb_dir, f) for f in os.listdir(tb_dir)
        ]
        records = []
        with open(event_file, "rb") as fh:
            while True:
                header = fh.read(8)
                if len(header) < 8:
                    break
                (length,) = struct.unpack("<Q", header)
                fh.read(4)  # length crc
                records.append(fh.read(length))
                fh.read(4)  # payload crc
        # file-version record + 2 scalar events
        scalar_records = [r for r in records if b"loss" in r]
        assert len(scalar_records) == 2, len(records)
        # JSONL is still written alongside
        lines = [json.loads(l) for l in open(str(tmp_path / "m.jsonl"))]
        assert lines[1]["note"] == "skipped-non-float"


class TestBenchmarkFn:
    def test_times_jitted_fn(self):
        fn = jax.jit(lambda x: x * 2)
        stats = profiling.benchmark_fn(fn, jnp.ones(16), repeats=3)
        assert stats["best_s"] > 0
        assert len(stats["runs"]) == 3

    def test_timer(self):
        with profiling.Timer() as t:
            pass
        assert t.elapsed >= 0


class TestDebugging:
    def test_checked_passes_clean(self):
        fn = debugging.checked(jax.jit(lambda x: x + 1))
        out = fn(jnp.ones(4))
        np.testing.assert_allclose(np.asarray(out), 2.0)

    def test_checked_catches_nan(self):
        fn = debugging.checked(jax.jit(lambda x: jnp.log(x)))
        with pytest.raises(Exception):
            fn(jnp.asarray([-1.0]))

    def test_assert_all_finite(self):
        debugging.assert_all_finite({"a": jnp.ones(3)})
        with pytest.raises(FloatingPointError):
            debugging.assert_all_finite({"a": jnp.asarray([1.0, np.nan])})
