"""Subprocess worker for the 2-process jax.distributed test: joins a
2-host CPU world (gloo collectives), feeds a rank-specific set of results
into a FinalSummaryTracker, reduces it with merge_final_counts, and writes
the merged dict as JSON. Launched by tests/test_distributed_multiprocess.py
with the TPU plugin scrubbed from the environment."""

import json
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RANK_RESULTS = {
    0: [
        {'label': 'pass', 'barcode': 0, 'status': 'okay'},
        {'label': 'pass', 'barcode': 1, 'status': 'okay'},
        {'label': 'fail', 'barcode': None, 'status': 'adapter_not_detected'},
    ],
    1: [
        {'label': 'pass', 'barcode': 0, 'status': 'okay'},
        {'label': 'artifact', 'barcode': 2, 'status': 'unsplit_read'},
    ],
}


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    outpath = sys.argv[3]

    from poreplex_tpu.parallel import distributed
    assert distributed.initialize('localhost:' + port, 2, rank)
    idx, cnt = distributed.process_info()
    assert (idx, cnt) == (rank, 2), (idx, cnt)

    from poreplex_tpu.io.writers import FinalSummaryTracker
    barcode_names = {None: 'undetermined', 0: 'BC1', 1: 'BC2', 2: 'BC3',
                     3: 'BC4'}
    label_names = {'pass': 'pass', 'fail': 'fail', 'artifact': 'artifact'}
    tracker = FinalSummaryTracker(label_names, barcode_names)
    tracker.feed_results(RANK_RESULTS[rank])

    merged = distributed.merge_final_counts(tracker)
    payload = sorted([list(map(str, key)), value]
                     for key, value in merged.items())
    with open(outpath, 'w') as f:
        json.dump(payload, f)


if __name__ == '__main__':
    main()
