"""Prefetch iterator tests."""

import time

import numpy as np
import pytest

from ssd_tensorflow_tpu.parallel.prefetch import prefetch_to_device


class TestPrefetch:
    def test_order_and_values(self):
        items = [np.full((4,), i, np.float32) for i in range(10)]
        out = list(prefetch_to_device(iter(items), size=2))
        assert len(out) == 10
        for i, x in enumerate(out):
            np.testing.assert_array_equal(np.asarray(x), items[i])

    def test_transform_splits_device_host(self):
        items = [(np.ones((2,), np.float32) * i, {"meta": i}) for i in range(5)]
        out = list(
            prefetch_to_device(
                iter(items), size=2, transform=lambda it: (it[0], it[1])
            )
        )
        for i, (dev, host) in enumerate(out):
            assert host == {"meta": i}
            np.testing.assert_array_equal(np.asarray(dev), items[i][0])

    def test_producer_overlaps(self):
        """Producer keeps working while the consumer is slow."""
        produced = []

        def gen():
            for i in range(4):
                produced.append(i)
                yield np.zeros((1,), np.float32)

        it = prefetch_to_device(gen(), size=2)
        next(it)
        time.sleep(0.2)
        # with depth 2, the producer should have run ahead
        assert len(produced) >= 3
        list(it)

    def test_error_propagates(self):
        def gen():
            yield np.zeros((1,), np.float32)
            raise RuntimeError("pipeline boom")

        it = prefetch_to_device(gen(), size=2)
        next(it)
        with pytest.raises(RuntimeError, match="pipeline boom"):
            list(it)
