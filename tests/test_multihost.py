"""Multi-host feeding plumbing, tested on the single-process 8-CPU mesh.

True multi-process JAX cannot run here; these tests pin the pieces that
do not need it: sample-list sharding arithmetic, global-batch assembly
via make_array_from_process_local_data (degenerates to shard_batch on
one process), addressable-row readback, and the prefetch put_fn hook.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.parallel.mesh import make_mesh
from ssd_tensorflow_tpu.parallel.multihost import (
    local_rows,
    make_global_batch,
    process_shard,
)
from ssd_tensorflow_tpu.parallel.prefetch import prefetch_to_device


class TestProcessShard:
    def test_even_split(self):
        items = list(range(12))
        shards = [process_shard(items, i, 4) for i in range(4)]
        assert shards == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]

    def test_uneven_split_covers_everything(self):
        items = list(range(10))
        shards = [process_shard(items, i, 4) for i in range(4)]
        assert [len(s) for s in shards] == [3, 3, 2, 2]
        assert sum(shards, []) == items

    def test_more_processes_than_items(self):
        items = [1, 2]
        shards = [process_shard(items, i, 4) for i in range(4)]
        assert sum(shards, []) == items
        assert [len(s) for s in shards] == [1, 1, 0, 0]

    def test_defaults_to_jax_process(self):
        items = list(range(5))
        assert process_shard(items) == items  # single process


class TestGlobalBatch:
    def test_single_process_equals_shard_batch(self):
        mesh = make_mesh()  # 8-way data
        rng = np.random.default_rng(0)
        batch = {
            "images": rng.integers(0, 255, (8, 16, 16, 3)).astype(np.uint8),
            "gt_boxes": rng.normal(0, 1, (8, 4, 4)).astype(np.float32),
        }
        out = make_global_batch(batch, mesh)
        for k in batch:
            assert out[k].shape == batch[k].shape
            np.testing.assert_array_equal(np.asarray(out[k]), batch[k])
            # sharded over the data axis
            assert "data" in str(out[k].sharding.spec)

    def test_local_rows_roundtrip(self):
        mesh = make_mesh()
        x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
        g = make_global_batch({"x": x}, mesh)["x"]
        np.testing.assert_array_equal(local_rows(g), x)

    def test_local_rows_dedups_replicated(self):
        # a fully-replicated array must come back once, not 8 times
        x = jnp.arange(6.0).reshape(2, 3)
        np.testing.assert_array_equal(local_rows(x), np.asarray(x))


class TestPrefetchPutFn:
    def test_put_fn_applied(self):
        mesh = make_mesh()

        def put(b):
            return make_global_batch(b, mesh)

        def gen():
            for i in range(3):
                yield (
                    {"x": np.full((8, 2), i, np.float32)},
                    i,
                )

        got = list(
            prefetch_to_device(
                gen(), size=2, put_fn=put, transform=lambda it: it
            )
        )
        assert len(got) == 3
        for i, (dev, aux) in enumerate(got):
            assert aux == i
            assert isinstance(dev["x"], jax.Array)
            assert "data" in str(dev["x"].sharding.spec)
            np.testing.assert_array_equal(
                np.asarray(dev["x"]), np.full((8, 2), i, np.float32)
            )


class TestShardEqualization:
    def test_truncated_shards_are_equal(self):
        """The train CLI truncates every shard to len//pc so all
        processes produce identical per-epoch batch counts (a mismatch
        deadlocks the collective SPMD step)."""
        from ssd_tensorflow_tpu.parallel.multihost import process_shard

        items = list(range(23))
        for pc in (2, 3, 4, 5):
            want = len(items) // pc
            lens = [
                len(process_shard(items, pi, pc)[:want]) for pi in range(pc)
            ]
            assert lens == [want] * pc
            # and nothing is counted twice
            seen = [
                x for pi in range(pc) for x in process_shard(items, pi, pc)[:want]
            ]
            assert len(set(seen)) == len(seen)


class TestLocalRowsMany:
    def test_matches_individual_local_rows(self, rng):
        """One combined fetch == per-array local_rows."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ssd_tensorflow_tpu.parallel.mesh import make_mesh
        from ssd_tensorflow_tpu.parallel.multihost import (
            local_rows,
            local_rows_many,
        )

        mesh = make_mesh(data=8)
        sharding = NamedSharding(mesh, P("data"))
        a = jax.device_put(
            rng.normal(0, 1, (8, 4)).astype("float32"), sharding
        )
        b = jax.device_put(rng.integers(0, 9, (8,)), sharding)
        got = local_rows_many([a, b])
        np.testing.assert_array_equal(got[0], local_rows(a))
        np.testing.assert_array_equal(got[1], local_rows(b))
