"""Real 2-process jax.distributed test on CPU: two worker processes join a
distributed world over a local coordinator (gloo CPU collectives), reduce
their FinalSummaryTracker count matrices with merge_final_counts, and must
both observe the identical global sum — the multi-host half of the pipeline
(SURVEY.md §5.8) exercised without TPU hardware."""

import json
import os
import socket
import subprocess
import sys

import pytest

from poreplex_tpu.parallel import distributed

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(TESTS_DIR, 'dist_worker.py')


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _scrubbed_env():
    """Environment without the preinstalled TPU PJRT plugin: the plugin
    registers itself regardless of JAX_PLATFORMS and would otherwise hijack
    the backend, leaving each process in a 1-process world."""
    drop_exact = {'PJRT_LIBRARY_PATH', 'TPU_LIBRARY_PATH', 'PYTHONPATH'}
    env = {k: v for k, v in os.environ.items()
           if k not in drop_exact and not k.startswith(('AXON_', 'TPU_',
                                                        'PALLAS_AXON_'))}
    env['JAX_PLATFORMS'] = 'cpu'
    return env


def test_two_process_merge_final_counts(tmp_path):
    port = _free_port()
    env = _scrubbed_env()
    procs, outs = [], []
    for rank in range(2):
        out = str(tmp_path / 'merged-{}.json'.format(rank))
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(port), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        stdout, stderr = p.communicate(timeout=180)
        assert p.returncode == 0, stderr.decode()[-2000:]

    merged = [json.load(open(out)) for out in outs]
    assert merged[0] == merged[1]
    counts = {tuple(k): v for k, v in merged[0]}
    # global sums over both ranks' feeds (see dist_worker.RANK_RESULTS)
    assert counts[('pass', '0', 'okay')] == 2
    assert counts[('pass', '1', 'okay')] == 1
    assert counts[('fail', 'None', 'adapter_not_detected')] == 1
    assert counts[('artifact', '2', 'unsplit_read')] == 1
    assert sum(counts.values()) == 5


def test_owns_entry_partitions_and_is_stable():
    entries = [('dir/f{}.fast5'.format(i), 'read-{}'.format(i))
               for i in range(200)]
    owners = []
    for e in entries:
        owner = [r for r in range(3) if distributed.owns_entry(e, r, 3)]
        assert len(owner) == 1          # exactly one host owns each entry
        owners.append(owner[0])
    # reasonably balanced and deterministic across calls
    for r in range(3):
        assert owners.count(r) > 200 // 6
    assert owners == [next(r for r in range(3)
                           if distributed.owns_entry(e, r, 3))
                      for e in entries]
    assert all(distributed.owns_entry(e, 0, 1) for e in entries[:5])
