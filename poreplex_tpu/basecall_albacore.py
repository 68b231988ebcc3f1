"""Optional on-the-fly basecalling via ONT albacore.

Mirrors the role of poreplex/basecall_albacore.py:34-122: drives albacore's
PipelineCore in single-process mode and converts its output into the event
table format used downstream. Albacore is proprietary, CPU-only and not
installable from PyPI; when it is absent this module degrades to a clear
error at configuration time (the reference probes availability in a
subprocess for the same reason, poreplex/commandline.py:213-218).
"""

import os
import sys

import numpy as np


def albacore_available():
    try:
        import albacore  # noqa: F401
        return True
    except ImportError:
        return False


def prepare_albacore(configpath, flowcell, kit):
    """Probe albacore version/flowcell support and write its configuration
    template (semantics of poreplex/basecall_albacore.py:34-62)."""
    from albacore import MIN_QSCORE
    from albacore.config_utils import get_barcoding_options  # noqa: F401
    from albacore.path_utils import get_default_path
    from albacore.config_selector import choose_config
    from albacore import __version__ as albacore_version

    if tuple(int(p) for p in albacore_version.split('.')[:2]) < (2, 3):
        raise RuntimeError('albacore >= 2.3.0 is required (found {})'
                           .format(albacore_version))

    data_path = get_default_path('', sys.argv)
    config, _ = choose_config(data_path, flowcell, kit)

    import configparser
    parser = configparser.ConfigParser(interpolation=None)
    parser.read(config)
    parser['basecaller']['min_qscore'] = '0'
    with open(configpath, 'w') as f:
        parser.write(f)
    return albacore_version


class AlbacoreBroker:

    def __init__(self, configpath, kmersize):
        from albacore.pipeline_core import PipelineCore
        self.core = PipelineCore(configpath, 0)  # single-process mode
        self.kmersize = kmersize

    def basecall(self, rawdata, f5reader, read_name):
        """Feed one read through albacore; returns the summary dict with the
        reversed RNA sequence (T->U) and event table, or None
        (poreplex/basecall_albacore.py:87-112)."""
        self.core.pass_data(read_name, rawdata, {
            'channel_id': f5reader.channel_number,
            'start_time': f5reader.start_time,
            'duration': f5reader.duration,
            'sampling_rate': f5reader.sampling_rate,
        })
        self.core.finish_all_jobs()
        results = self.core.get_results()
        if not results:
            return None
        res = results[0]

        events = self.adopt_basecalled_table(res['events'])
        sequence = res['sequence'][::-1].replace('T', 'U')
        qstring = res['qstring'][::-1]
        return {
            'events': events,
            'sequence': sequence,
            'qstring': qstring,
            'sequence_length': len(sequence),
            'mean_qscore': res['mean_qscore'],
            'called_events': len(events),
        }

    def adopt_basecalled_table(self, events):
        from .fast5 import EventTable
        return EventTable.from_structured(np.asarray(events))
