#!/usr/bin/env python3
"""Write a synthetic FAST5 fixture directory for manual runs.

Usage: python tools/make_fixtures.py [OUTDIR] [N_READS]
"""

import sys

from poreplex_tpu import simulate


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/f5fix'
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    entries = simulate.make_fixture_dir(outdir, n_reads=n_reads, seed=42)
    entries += simulate.make_fixture_dir(
        outdir + '/multi', n_reads=max(2, n_reads // 3), seed=43,
        multi_read=True, basecall='guppy')
    print('wrote {} reads under {}'.format(len(entries), outdir))


if __name__ == '__main__':
    main()
