"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax

from poreplex_tpu.config import build_config
from poreplex_tpu.pipeline.engine import DeviceEngine
from poreplex_tpu.parallel.mesh import make_mesh, batch_sharding
from poreplex_tpu.parallel.sharding import ShardedEngine
from poreplex_tpu.parallel import distributed


@pytest.fixture(scope='module')
def tiny_engine(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp('cfg'))
    config = build_config(tmp, tmp, barcoding=True, device_batch_size=16)
    config['segmentation']['segmentation_scan_limit'] = 1500
    return DeviceEngine(config)


def example_inputs(engine, batch, seed=0):
    rng = np.random.RandomState(seed)
    pooled = rng.normal(90, 12, (batch, engine.wire_frames)
                        ).astype(np.float32)
    pooled_len = np.full(batch, engine.seg_frames, np.int32)
    head_len = np.minimum(engine.scaler.pooled_length, engine.wire_frames)
    return pooled, pooled_len, np.full(batch, head_len, np.int32)


def test_sharded_equals_unsharded(tiny_engine, cpu_devices):
    assert len(cpu_devices) >= 8, 'conftest must force 8 CPU devices'
    mesh = make_mesh(cpu_devices[:8])
    sharded = ShardedEngine(tiny_engine, mesh)

    inputs = example_inputs(tiny_engine, 16)
    ref = tiny_engine.run_stage1(*inputs)
    got = sharded.run_stage1(*inputs)
    for key in ref:
        np.testing.assert_allclose(got[key], ref[key], rtol=2e-5, atol=2e-5,
                                   err_msg=key)
    # discrete outputs must be identical
    np.testing.assert_array_equal(got['first'], ref['first'])
    np.testing.assert_array_equal(got['last'], ref['last'])
    np.testing.assert_array_equal(got['qc_ok'], ref['qc_ok'])


def test_sharded_pads_uneven_batches(tiny_engine, cpu_devices):
    mesh = make_mesh(cpu_devices[:8])
    sharded = ShardedEngine(tiny_engine, mesh)
    inputs = example_inputs(tiny_engine, 11, seed=3)
    out = sharded.run_stage1(*inputs)
    assert out['scaling'].shape[0] == 11


def test_shard_file_list_partitions():
    entries = [('f{}.fast5'.format(i), 'r{}'.format(i)) for i in range(10)]
    parts = [distributed.shard_file_list(entries, process_index=p,
                                         process_count=3)
             for p in range(3)]
    flat = [e for part in parts for e in part]
    assert sorted(flat) == sorted(entries)
    assert abs(len(parts[0]) - len(parts[2])) <= 1


def test_allreduce_counts_single_host():
    counts = np.arange(12, dtype=np.int64).reshape(3, 4)
    out = distributed.allreduce_counts(counts)
    np.testing.assert_array_equal(out, counts)
