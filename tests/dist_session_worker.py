"""Subprocess worker for the 2-process FULL-SESSION distributed test: joins
a 2-host CPU world, then runs a complete ProcessingSession over a shared
fixture directory. Each host admits only its owned slice of the read
entries (session.queue_processing -> distributed.owns_entry) and the final
count matrices are reduced across hosts at the end of the run
(session ProcessingSession.run -> distributed.merge_final_counts).

Writes JSON: the manifest of processed (filename, read_id) entries and —
on host 0 — the merged count matrix. Launched by
tests/test_distributed_multiprocess.py with the TPU plugin scrubbed.
"""

import json
import logging
import os
import sys
import time

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rank = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    indir = sys.argv[4]
    outdir = sys.argv[5]
    resultpath = sys.argv[6]

    # scaling-bench mode: pin this "host" to its own CPU so the
    # 1-proc-vs-2-proc comparison measures framework scaling, not
    # oversubscription of the shared cores (each real pod host owns its
    # CPUs). Format: comma-separated CPU ids.
    affinity = os.environ.get('PPTPU_CPU_AFFINITY')
    if affinity:
        os.sched_setaffinity(0, {int(c) for c in affinity.split(',')})

    if nprocs > 1:
        from poreplex_tpu.parallel import distributed
        assert distributed.initialize('localhost:' + port, nprocs, rank)

    from poreplex_tpu.config import build_config
    from poreplex_tpu.pipeline.session import ProcessingSession

    config = build_config(indir, outdir, barcoding=True, trim_adapter=True,
                          quiet=True, device_batch_size=32,
                          prewarm=bool(os.environ.get('PPTPU_PREWARM')))
    logger = logging.getLogger('dist-session-{}'.format(rank))
    logger.addHandler(logging.NullHandler())
    logger.propagate = False

    if config['prewarm']:
        # compile every program shape before the timed session so the
        # scaling number excludes XLA compilation
        from poreplex_tpu.pipeline.analyzer import get_analyzer
        get_analyzer(config)

    t0 = time.perf_counter()
    printer = ProcessingSession.run(config, logger)
    session_s = time.perf_counter() - t0
    # host 0 gets the merged printer; other hosts return None by contract
    assert (printer is not None) == (rank == 0), (rank, printer)

    manifest = []
    with open(os.path.join(outdir, '.processed-reads')) as f:
        for line in f:
            line = line.rstrip('\n')
            if line:
                manifest.append(line.split('\t')[:2])

    payload = {'rank': rank, 'session_s': session_s,
               'manifest': sorted(map(tuple, manifest))}
    if rank == 0:
        # counts were merged in-place on the session's tracker before the
        # printer was returned; re-read them off the bound method
        tracker = printer.__self__
        payload['merged_counts'] = sorted(
            [list(map(str, key)), value]
            for key, value in tracker.counts.items())
    with open(resultpath, 'w') as f:
        json.dump(payload, f)


if __name__ == '__main__':
    main()
