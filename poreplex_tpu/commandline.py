"""Command-line interface.

Same option surface and preflight behavior as the reference CLI
(poreplex/commandline.py:263-410) plus TPU-specific pipeline options.
Console entry point: ``poreplex-tpu`` (also ``python -m poreplex_tpu``).
"""

import argparse
import logging
import os
import shutil
import sys

from . import __version__
from .config import load_preset, setup_output_name_mapping
from .utils import errx, errprint

VERSION_STRING = """\
poreplex-tpu version {version}
TPU-native signal-level preprocessor for nanopore direct RNA sequencing
""".format(version=__version__)


def show_banner():
    print("""
\x1b[1mPoreplex-TPU\x1b[0m version {version}
- Cuts nanopore direct RNA sequencing data into bite-size pieces, on TPU
""".format(version=__version__))


def load_config(args):
    config = load_preset(args.config)
    return config


def init_logging(config):
    logfile = os.path.join(config['outputdir'], 'poreplex.log')
    logger = logging.getLogger('poreplex_tpu')
    logger.propagate = False
    handler = logging.FileHandler(logfile, 'w')
    logger.setLevel(logging.INFO)
    handler.setFormatter(logging.Formatter('%(asctime)-15s %(message)s'))
    logger.addHandler(handler)
    return logger


# sink flag -> subdirectory; one entry per optional output family. The
# names are layout constants required for output parity with the
# reference's directory tree.
OUTPUT_SUBDIRS = (
    ('fastq_output', 'fastq'),
    ('fast5_output', 'fast5'),
    ('nanopolish_output', 'nanopolish'),
    ('minimap2_index', 'bam'),
    ('dump_adapter_signals', 'adapter-dumps'),
    ('dump_basecalls', 'events'),
)


def _confirm_clear(outputdir):
    """Interactive gate before wiping a non-empty output directory:
    y => proceed, empty/n => abort the run, anything else => ask again."""
    prompt = ('Output directory {} is not empty. Clear it? '
              '(y/N) '.format(outputdir))
    while True:
        try:
            answer = input(prompt).lower()
        except KeyboardInterrupt:
            raise SystemExit
        if answer.startswith('y'):
            print()
            return
        if not answer or answer.startswith('n'):
            sys.exit(1)


def create_output_directories(config):
    """Prepare the output tree. Behavior contract (role of
    poreplex/commandline.py:90-135): a non-empty output directory is
    cleared — behind an interactive y/N gate when enabled, and skipped
    entirely under --resume, which keeps prior outputs for the manifest to
    dedup against; subdirectories appear only for enabled sinks; the
    tmpdir is created on demand and flagged for end-of-run cleanup."""
    outputdir = config['outputdir']
    leftovers = [] if config.get('resume') else os.listdir(outputdir)
    if leftovers:
        if config['interactive']:
            _confirm_clear(outputdir)
        for entry in leftovers:
            path = os.path.join(outputdir, entry)
            (shutil.rmtree if os.path.isdir(path) else os.unlink)(path)

    for flag, subdir in OUTPUT_SUBDIRS:
        if config[flag]:
            os.makedirs(os.path.join(outputdir, subdir), exist_ok=True)

    if not os.path.isdir(config['tmpdir']):
        os.makedirs(config['tmpdir'])
        config['cleanup_tmpdir'] = True


def show_configuration(config, output):
    """(poreplex/commandline.py:162-191)"""
    from functools import partial
    if hasattr(output, 'write'):
        _ = partial(print, sep='\t', file=output)
    else:
        _ = lambda *args: output.info(' '.join(map(str, args)))
    bool2yn = lambda b: 'Yes' if b else 'No'

    _("== Analysis settings ======================================")
    _(" * Input:", config['inputdir'],
      '(live, {} sec delay)'.format(config['analysis_start_delay'])
      if config['live'] else '')
    _(" * Output:", config['outputdir'])
    _(" * Device batch size:", config['device_batch_size'])
    _(" * Presets:", config['preset_name'])
    _(" * Basecall on-the-fly:\t",
      'Yes (albacore {})'.format(config.get('albacore_version'))
      if config['albacore_onthefly'] else 'No (use previous analyses)')
    _(" * Trim 3' adapter:\t", bool2yn(config['trim_adapter']))
    _(" * Filter concatenated read:", bool2yn(config['filter_unsplit_reads']))
    _(" * Separate by barcode:\t", bool2yn(config['barcoding']))
    _(" * Real-time alignment:\t", bool2yn(config['minimap2_index']))
    _(" * FASTQ in output:\t", bool2yn(config['fastq_output']))
    _(" * FAST5 in output:\t", bool2yn(config['fast5_output']))
    _(" * Basecall table in output:", bool2yn(config['dump_basecalls']))
    if config['dump_adapter_signals']:
        _(" * Dump adapter signals for training:", "Yes")
    _("===========================================================")
    _("")


def test_optional_features(config):
    """(poreplex/commandline.py:207-233)"""
    if config['albacore_onthefly']:
        from .basecall_albacore import albacore_available, prepare_albacore
        if not albacore_available():
            errx('ERROR: On-the-fly basecalling (--basecall) requires the '
                 'ONT albacore package.')
        config['albacore_configuration'] = os.path.join(
            config['outputdir'], 'albacore-configuration.cfg')
        config['albacore_version'] = prepare_albacore(
            config['albacore_configuration'], config['flowcell'],
            config['kit'])

    if config['minimap2_index']:
        try:
            import mappy  # noqa: F401
            import pysam  # noqa: F401
        except ImportError:
            errx('ERROR: Real-time alignment (--align) requires mappy and '
                 'pysam.')

    if config['live']:
        # inotify optional: a polling fallback exists (pipeline/session.py)
        pass


def test_inputs_and_outputs(config):
    if not os.path.isdir(config['inputdir']):
        errx('ERROR: Cannot open the input directory {}.'.format(
            config['inputdir']))
    if not os.path.isdir(config['outputdir']):
        try:
            os.makedirs(config['outputdir'])
        except OSError:
            errx('ERROR: Failed to create the output directory {}.'.format(
                config['outputdir']))
    if config['minimap2_index']:
        from .alignment import check_minimap2_index
        try:
            check_minimap2_index(config['minimap2_index'])
        except Exception:
            errx('ERROR: Could not load a minimap2 index from {}.'.format(
                config['minimap2_index']))


def fix_options(config):
    if config['dashboard'] and not config['minimap2_index']:
        errprint('WARNING: Dashboard is turned off because it is not '
                 'informative without sequence alignments.')
        config['dashboard'] = False
        errprint('')


def main(args):
    if not args.quiet:
        show_banner()

    config = load_config(args)
    config['quiet'] = args.quiet
    config['interactive'] = not args.yes
    config['inputdir'] = args.input
    config['outputdir'] = args.output
    config['live'] = args.live
    config['analysis_start_delay'] = args.live_delay if args.live else 0
    config['dashboard'] = args.dashboard
    config['contig_aliases'] = args.contig_aliases
    config['tmpdir'] = args.tmpdir or os.path.join(args.output, 'tmp')
    config['cleanup_tmpdir'] = False
    config['barcoding'] = args.barcoding
    config['barcoding_quality_filter'] = args.barcoding_quality_filter
    config['measure_polya'] = args.polya
    config['filter_unsplit_reads'] = args.filter_chimera
    config['batch_chunk_size'] = args.batch_size
    config['albacore_onthefly'] = args.basecall
    config['dump_adapter_signals'] = args.dump_adapter_signals
    config['dump_basecalls'] = args.dump_basecalled_events
    config['fastq_output'] = args.align is None or args.fastq
    config['fast5_output'] = args.fast5 or args.nanopolish
    config['fast5_batch_size'] = args.fast5_batch_size
    config['nanopolish_output'] = args.nanopolish
    config['trim_adapter'] = args.trim_adapter
    config['minimum_sequence_length'] = args.minimum_length
    config['minimap2_index'] = args.align if args.align else None
    config['device_batch_size'] = args.device_batch_size
    config['wire_precision'] = args.wire_precision
    config['pallas'] = args.pallas
    config['resume'] = args.resume
    config['prewarm'] = args.prewarm
    config['parallel'] = max(1, args.parallel)
    config['mesh_shape'] = args.mesh_shape
    config['num_nodes'] = args.num_nodes
    config['node_rank'] = args.node_rank
    config['coordinator'] = args.coordinator
    config['io_threads'] = 2
    config['nobasecall_stop_trigger'] = 1000
    (config['label_names'], config['barcode_names'],
     config['output_layout']) = setup_output_name_mapping(config)

    fix_options(config)
    test_inputs_and_outputs(config)
    create_output_directories(config)

    logger = init_logging(config)
    test_optional_features(config)

    # multi-host bootstrap must precede any device use so every process
    # joins the global runtime before the engine compiles
    from .parallel import distributed
    distributed.initialize_from_config(config)

    logger.info('Starting poreplex-tpu version {}'.format(__version__))
    logger.info('Command line: ' + ' '.join(sys.argv))

    show_configuration(config, output=logger)
    if not config['quiet']:
        show_configuration(config, output=sys.stdout)

    from .pipeline.session import ProcessingSession
    procresult = ProcessingSession.run(config, logger)

    if procresult is not None:
        if not config['quiet']:
            procresult(sys.stdout)
        procresult(logger)

    logger.info('Finished.')

    if config['cleanup_tmpdir']:
        try:
            shutil.rmtree(config['tmpdir'])
        except OSError:
            pass


def __main__():
    parser = argparse.ArgumentParser(
        prog='poreplex-tpu', add_help=False,
        description='Cuts nanopore direct RNA sequencing data into bite-size '
                    'pieces for RNA Biology — TPU-native engine')

    group = parser.add_argument_group('Data Settings')
    group.add_argument('-i', '--input', required=True, metavar='DIR',
                       help='path to the directory with the input FAST5 '
                            'files (Required)')
    group.add_argument('-o', '--output', required=True, metavar='DIR',
                       help='output directory path (Required)')
    group.add_argument('-c', '--config', default='', metavar='NAME',
                       help='path to signal processing configuration')

    group = parser.add_argument_group('Basic Processing Options')
    group.add_argument('--trim-adapter', default=False, action='store_true',
                       help="trim 3' adapter sequences from FASTQ outputs")
    group.add_argument('--minimum-length', default=10, type=int,
                       metavar='LEN',
                       help='discard reads shorter than LEN (default: 10)')
    group.add_argument('--filter-chimera', default=False, action='store_true',
                       help='remove unsplit reads fused of two or more RNAs '
                            'in output')

    group = parser.add_argument_group('Optional Analyses')
    group.add_argument('--barcoding', default=False, action='store_true',
                       help='sort barcoded reads into separate outputs')
    group.add_argument('--barcoding-quality-filter', default=18, type=int,
                       metavar='SCORE',
                       help='ignore barcode patterns having quality scores '
                            'lower than SCORE in phred-scale (default: 18)')
    group.add_argument('--polya', default=False, action='store_true',
                       help='output poly(A) tail length measurements')
    group.add_argument('--basecall', default=False, action='store_true',
                       help='call the ONT albacore for basecalling '
                            'on-the-fly')
    group.add_argument('--align', default=None, type=str,
                       metavar='INDEXFILE',
                       help='align basecalled reads using minimap2 and '
                            'create BAM files')

    group = parser.add_argument_group('Live Mode')
    group.add_argument('--live', default=False, action='store_true',
                       help='monitor new files in the input directory')
    group.add_argument('--live-delay', default=60, type=int,
                       metavar='SECONDS',
                       help='time to delay the start of analysis in live '
                            'mode (default: 60)')

    group = parser.add_argument_group('Output Options')
    group.add_argument('--fastq', default=False, action='store_true',
                       help='write to FASTQ files even when BAM files are '
                            'produced')
    group.add_argument('--fast5', default=False, action='store_true',
                       help='link or copy FAST5 files to separate output '
                            'directories')
    group.add_argument('--fast5-batch-size', default=4000, type=int,
                       help='number of reads in a FAST5 for output')
    group.add_argument('--nanopolish', default=False, action='store_true',
                       help='create a nanopolish readdb to enable access '
                            'from nanopolish')
    group.add_argument('--dump-adapter-signals', default=False,
                       action='store_true',
                       help='dump adapter signal dumps for training')
    group.add_argument('--dump-basecalled-events', default=False,
                       action='store_true',
                       help='dump basecalled events to the output')

    group = parser.add_argument_group('User Interface')
    group.add_argument('--dashboard', default=False, action='store_true',
                       help='show the full screen dashboard')
    group.add_argument('--contig-aliases', default=None, metavar='FILE',
                       type=str,
                       help='path to a tab-separated text file for aliases '
                            'to show as a contig names in the dashboard')
    group.add_argument('-q', '--quiet', default=False, action='store_true',
                       help='suppress non-error messages')
    group.add_argument('-y', '--yes', default=False, action='store_true',
                       help='suppress all questions')

    group = parser.add_argument_group('Pipeline Options')
    group.add_argument('-p', '--parallel', default=1, type=int,
                       metavar='COUNT',
                       help='number of host ingest worker processes '
                            '(poreplex-compatible flag; device compute is '
                            'batched on the accelerator regardless; '
                            'default: 1)')
    group.add_argument('--device-batch-size', default=256, type=int,
                       metavar='SIZE',
                       help='reads per device batch (default: 256; larger '
                            'batches raise sequential-scan lane '
                            'utilization on TPU)')
    group.add_argument('--pallas', default='auto',
                       choices=('auto', 'always', 'never'),
                       help='fused Pallas TPU kernels for the Viterbi '
                            'decode (default: auto — on for TPU backends)')
    group.add_argument('--wire-precision', default='exact',
                       choices=('exact', 'fast'),
                       help='host->device signal transport: "exact" u16 '
                            'fixed point (lossless in practice) or "fast" '
                            'u8 per-read affine (half the upload bytes, '
                            '~0.5 pA quantization; default: exact)')
    group.add_argument('--prewarm', default=False, action='store_true',
                       help='compile every device-program shape before '
                            'processing starts (keeps TPU compiles out of '
                            'batch latency; recommended with --live)')
    group.add_argument('--tmpdir', default='', type=str, metavar='DIR',
                       help='temporary directory for intermediate data')
    group.add_argument('--batch-size', default=256, type=int, metavar='SIZE',
                       help='number of reads in a single batch '
                            '(default: 256)')
    group.add_argument('--cpu', default=False, action='store_true',
                       help='run device compute on the host CPU backend '
                            'instead of TPU')
    group.add_argument('--mesh-shape', default=None, type=int, metavar='N',
                       help='number of local chips for the data-parallel '
                            'mesh (default: all addressable devices)')

    group = parser.add_argument_group('Distributed (multi-host)')
    group.add_argument('--num-nodes', default=None, type=int, metavar='N',
                       help='total number of hosts in the pod slice; reads '
                            'are sharded across hosts and final counts '
                            'merged (default: single host)')
    group.add_argument('--node-rank', default=None, type=int, metavar='I',
                       help='rank of this host (0..N-1)')
    group.add_argument('--coordinator', default=None, metavar='HOST:PORT',
                       help='jax.distributed coordinator address '
                            '(host 0 of the slice)')
    group.add_argument('--resume', default=False, action='store_true',
                       help='keep the output directory and skip reads '
                            'recorded in its processed-read manifest')
    group.add_argument('--version', action='version',
                       version=VERSION_STRING)
    group.add_argument('-h', '--help', action='help',
                       help='show this help message and exit')

    args = parser.parse_args(sys.argv[1:])
    if args.cpu:
        import jax
        jax.config.update('jax_default_device', jax.devices('cpu')[0])
    main(args)


if __name__ == '__main__':
    __main__()
