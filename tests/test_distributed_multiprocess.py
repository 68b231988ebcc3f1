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

# full-session / workflow tests take minutes; `-m "not slow"` skips them
pytestmark = pytest.mark.slow

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


def _make_session_fixtures(indir, n_files=2, reads_per_file=16, seed=42):
    import numpy as np
    from poreplex_tpu import simulate
    rng = np.random.RandomState(seed)
    total = 0
    for fileno in range(n_files):
        reads = [simulate.simulate_read(
                     rng,
                     transcript_len=int(rng.uniform(4000, 9000)),
                     polya_len=int(rng.uniform(900, 2000)),
                     adapter_len=int(rng.uniform(4200, 6000)))
                 for _ in range(reads_per_file)]
        simulate.write_multi_read_fast5(
            os.path.join(indir, 'batch{:02d}.fast5'.format(fileno)), reads)
        total += len(reads)
    return total


def _run_session_workers(tmp_path, indir, nprocs, port, tag):
    """Launch ``nprocs`` full-session workers over one fixture dir; returns
    their parsed JSON payloads ordered by rank."""
    WORKER_SESSION = os.path.join(TESTS_DIR, 'dist_session_worker.py')
    env = _scrubbed_env()
    procs, outs = [], []
    for rank in range(nprocs):
        outdir = tmp_path / '{}-out-{}'.format(tag, rank)
        outdir.mkdir()
        result = str(tmp_path / '{}-result-{}.json'.format(tag, rank))
        outs.append(result)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER_SESSION, str(rank), str(nprocs),
             str(port), indir, str(outdir), result],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, stderr.decode()[-3000:]
    return [json.load(open(out)) for out in outs]


def test_two_process_full_session(tmp_path):
    """The whole multi-host story under a real 2-process world: two
    ProcessingSession.run()s over one fixture directory must (a) admit
    disjoint read slices whose union is the complete set
    (session.queue_processing ownership gate) and (b) produce a host-0
    merged count matrix identical to a single-host run of the same
    fixtures (end-of-run merge_final_counts collective)."""
    indir = str(tmp_path / 'fast5')
    os.makedirs(indir)
    n_reads = _make_session_fixtures(indir)

    two = _run_session_workers(tmp_path, indir, 2, _free_port(), 'dist')
    manifests = [set(map(tuple, payload['manifest'])) for payload in two]
    assert manifests[0] and manifests[1]        # both hosts did real work
    assert not (manifests[0] & manifests[1])    # disjoint admission
    assert len(manifests[0] | manifests[1]) == n_reads

    single = _run_session_workers(tmp_path, indir, 1, _free_port(), 'solo')
    assert set(map(tuple, single[0]['manifest'])) == \
        manifests[0] | manifests[1]
    assert two[0]['merged_counts'] == single[0]['merged_counts']
    assert sum(v for _, v in two[0]['merged_counts']) == n_reads


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
