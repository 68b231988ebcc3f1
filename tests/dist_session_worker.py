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

    if nprocs > 1:
        from poreplex_tpu.parallel import distributed
        assert distributed.initialize('localhost:' + port, nprocs, rank)

    from poreplex_tpu.config import build_config
    from poreplex_tpu.pipeline.session import ProcessingSession

    config = build_config(indir, outdir, barcoding=True, trim_adapter=True,
                          quiet=True, device_batch_size=32)
    logger = logging.getLogger('dist-session-{}'.format(rank))
    logger.addHandler(logging.NullHandler())
    logger.propagate = False

    printer = ProcessingSession.run(config, logger)
    # host 0 gets the merged printer; other hosts return None by contract
    assert (printer is not None) == (rank == 0), (rank, printer)

    manifest = []
    with open(os.path.join(outdir, '.processed-reads')) as f:
        for line in f:
            line = line.rstrip('\n')
            if line:
                manifest.append(line.split('\t')[:2])

    payload = {'rank': rank, 'manifest': sorted(map(tuple, manifest))}
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
