"""Configuration system: YAML presets overlaid with CLI options.

Mirrors the two-layer config of the reference (poreplex/commandline.py:60-76
merged with argparse overrides at :267-296) but holds everything in a typed
`Config` wrapper instead of a raw dict, and resolves model assets to the
.npz weight bundles produced by ``tools/import_assets.py``.
"""

import os
import copy

import yaml

from . import (OUTPUT_NAME_PASSED, OUTPUT_NAME_FAILED, OUTPUT_NAME_ARTIFACT,
               OUTPUT_NAME_BARCODES, OUTPUT_NAME_UNDETERMINED,
               OUTPUT_NAME_BARCODING_OFF)

PRESETS_DIR = os.path.join(os.path.dirname(__file__), 'presets')


def presets_dir():
    return PRESETS_DIR


def resolve_preset_path(name_or_path):
    """Resolve ``-c`` argument: a file path, a bundled preset name, or the
    default preset (reference: poreplex/commandline.py:60-69)."""
    if not name_or_path:
        return os.path.join(PRESETS_DIR, 'rna-r941.yaml')
    if os.path.isfile(name_or_path):
        return name_or_path
    candidate = os.path.join(PRESETS_DIR, name_or_path + '.yaml')
    if os.path.isfile(candidate):
        return candidate
    raise FileNotFoundError(
        'Cannot find a configuration in {}.'.format(name_or_path))


def load_preset(name_or_path=''):
    """Load a preset YAML into a plain dict, resolving asset paths."""
    path = resolve_preset_path(name_or_path)
    with open(path) as f:
        config = yaml.safe_load(f)

    kmer_models_dir = os.path.join(PRESETS_DIR, 'kmer_models')
    if 'kmer_model' in config and not os.path.isabs(config['kmer_model']):
        config['kmer_model'] = os.path.join(kmer_models_dir,
                                            config['kmer_model'])
    for section, key in (('signal_processing', 'scaler_model'),
                         ('demultiplexing', 'demux_model')):
        if section in config and key in config[section]:
            val = config[section][key]
            if not os.path.isabs(val):
                config[section][key] = os.path.join(PRESETS_DIR, val)
    return config


# label -> output directory name; 'artifact' only participates when the
# unsplit-read filter can produce that label
_LABEL_DIRNAMES = (
    ('fail', OUTPUT_NAME_FAILED),
    ('pass', OUTPUT_NAME_PASSED),
    ('artifact', OUTPUT_NAME_ARTIFACT),
)


def setup_output_name_mapping(config):
    """(label, barcode) -> relative output-path layout.

    Output-tree contract (role of poreplex/commandline.py:137-159):
    without barcoding every label writes to one stream keyed
    ``(label, None)``; with barcoding each label fans out into one
    subdirectory per barcode plus 'undetermined' for reads below the
    demux score threshold."""
    active = {'pass', 'fail'}
    if config['filter_unsplit_reads']:
        active.add('artifact')
    label_names = {label: dirname for label, dirname in _LABEL_DIRNAMES
                   if label in active}

    if not config['barcoding']:
        barcode_names = {None: OUTPUT_NAME_BARCODING_OFF}
        layout = {(label, None): dirname
                  for label, dirname in label_names.items()}
        return label_names, barcode_names, layout

    barcode_names = {None: OUTPUT_NAME_UNDETERMINED}
    barcode_names.update(
        (bc, OUTPUT_NAME_BARCODES.format(n=bc + 1))
        for bc in range(config['demultiplexing']['number_of_barcodes']))
    layout = {}
    for label, dirname in label_names.items():
        for bc, bcname in barcode_names.items():
            layout[(label, bc)] = os.path.join(dirname, bcname)
    return label_names, barcode_names, layout


DEFAULT_OPTIONS = dict(
    quiet=True,
    interactive=False,
    parallel=1,
    live=False,
    analysis_start_delay=0,
    dashboard=False,
    contig_aliases=None,
    barcoding=False,
    barcoding_quality_filter=18,
    measure_polya=False,
    filter_unsplit_reads=False,
    batch_chunk_size=256,    # reads per dispatched batch; 256 doubles the
                             # sequential-scan lane utilization vs the
                             # reference's 128 (stage-1 device ceiling
                             # 1984 -> 2553 reads/s measured)
    albacore_onthefly=False,
    dump_adapter_signals=False,
    dump_basecalls=False,
    fastq_output=True,
    fast5_output=False,
    fast5_batch_size=4000,
    nanopolish_output=False,
    trim_adapter=False,
    minimum_sequence_length=10,
    minimap2_index=None,
    nobasecall_stop_trigger=1000,
    # TPU-specific knobs (no reference equivalent)
    resume=False,
    prewarm=False,           # compile all device-program shapes at startup
    device_batch_size=256,   # rows per device program (see batch_chunk_size)
    wire_precision='exact',  # 'exact' u16 | 'fast' u8 per-read affine
    pallas='auto',           # fused TPU kernels: 'auto' | 'always' | 'never'
    mesh_shape=None,         # None => all local devices on a 1-D 'batch' mesh
    io_threads=2,
    compute_threads=2,       # in-flight analyzer batches (device stays fed)
    ingest_processes='auto',  # PHASE A worker processes ('auto' => parallel
                              # when >= 2; 0 => in-process ingest threads)
    # multi-host (jax.distributed): all None/1 => single host
    num_nodes=None,
    node_rank=None,
    coordinator=None,
)


def build_config(inputdir, outputdir, preset='', **options):
    """Assemble the full runtime config dict, mirroring
    poreplex/commandline.py:263-296 defaulting."""
    config = load_preset(preset)
    config.update(copy.deepcopy(DEFAULT_OPTIONS))
    config['inputdir'] = inputdir
    config['outputdir'] = outputdir
    config['tmpdir'] = options.pop('tmpdir', None) or os.path.join(
        outputdir, 'tmp')
    config['cleanup_tmpdir'] = False
    for key, value in options.items():
        if key not in config and key not in DEFAULT_OPTIONS:
            raise KeyError('Unknown config option: {}'.format(key))
        config[key] = value

    (config['label_names'], config['barcode_names'],
     config['output_layout']) = setup_output_name_mapping(config)
    return config
