"""Byte-exact whole-run golden regression (VERDICT r4 #6).

test_full_session asserts structure and tolerances; a refactor could
still shift barcode scores, trim lengths, or dwell times silently. This
test freezes the COMPLETE canonical output of one deterministic session
(sequencing summary minus row order + every FASTQ record) and diffs it
byte-exact against a checked-in golden.

The session runs reduced program shapes (scan limit 22500 covers the
whole ~18.6k-sample fixture reads; scaler head 3000) so the XLA:CPU
compiles stay in the fast tier's budget; the code paths exercised are
identical to production. Regenerate after an INTENDED behavior change:

    POREPLEX_TPU_REGEN_GOLDENS=1 python -m pytest \
        tests/test_golden_session.py -q

and review the golden diff like any other code change. Goldens are tied
to the CPU test backend (conftest pins it); reference output schema:
/root/reference/poreplex/io.py:120-184.
"""

import gzip
import json
import logging
import os
import pathlib

import pytest

GOLDEN_PATH = pathlib.Path(__file__).parent / 'golden' / \
    'session_golden.json'


def _canonical_outputs(outputdir):
    """Session outputs in a batch-order-independent canonical form."""
    with open(os.path.join(outputdir, 'sequencing_summary.txt')) as f:
        lines = f.read().splitlines()
    summary = [lines[0]] + sorted(lines[1:])

    records = []
    fastq_root = os.path.join(outputdir, 'fastq')
    for root, dirs, files in os.walk(fastq_root):
        for fn in sorted(files):
            with gzip.open(os.path.join(root, fn)) as f:
                content = f.read().decode()
            rows = content.splitlines()
            label = os.path.relpath(root, fastq_root)
            for i in range(0, len(rows), 4):
                records.append('{}\n{}'.format(label,
                                               '\n'.join(rows[i:i + 4])))
    return {'summary': summary, 'fastq': sorted(records)}


@pytest.fixture(scope='module')
def session_outputs(tmp_path_factory):
    from poreplex_tpu import simulate
    from poreplex_tpu.config import build_config
    from poreplex_tpu.pipeline.session import ProcessingSession

    indir = tmp_path_factory.mktemp('golden-in')
    simulate.make_fixture_dir(str(indir), n_reads=6, seed=20,
                              polya_len=2400)
    sub = indir / 'nested'
    simulate.make_fixture_dir(str(sub), n_reads=3, seed=21,
                              multi_read=True, basecall='guppy')
    outdir = str(tmp_path_factory.mktemp('golden-out'))

    config = build_config(str(indir), outdir, device_batch_size=8,
                          barcoding=True, measure_polya=True,
                          filter_unsplit_reads=True, trim_adapter=True,
                          quiet=True)
    config['segmentation']['segmentation_scan_limit'] = 22500
    config['signal_processing']['scaler_input_length'] = 3000
    printer = ProcessingSession.run(config,
                                    logging.getLogger('test-golden'))
    assert printer is not None
    return _canonical_outputs(outdir)


def test_session_outputs_match_golden(session_outputs):
    if os.environ.get('POREPLEX_TPU_REGEN_GOLDENS'):
        GOLDEN_PATH.write_text(json.dumps(session_outputs, indent=1))
        pytest.skip('goldens regenerated at {}'.format(GOLDEN_PATH))
    assert GOLDEN_PATH.exists(), (
        'no golden checked in; run with POREPLEX_TPU_REGEN_GOLDENS=1')
    golden = json.loads(GOLDEN_PATH.read_text())
    # summary first (field-level diffs read better than fastq blobs)
    assert session_outputs['summary'] == golden['summary']
    assert session_outputs['fastq'] == golden['fastq']
