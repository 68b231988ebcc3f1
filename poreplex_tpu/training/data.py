"""Synthetic training-data generators.

The reference trains from real MinION runs prepared by Snakemake pipelines
(training/barcodes/scripts/prepare_training_data.py,
training/signal-scaling/scripts/extract-signals.py). Those datasets are not
redistributable; these generators produce structurally equivalent synthetic
data — barcode-specific adapter signal signatures and scaling-target signal
heads — so the training loop, losses, calibration and checkpoint formats
are exercised end to end and new models can be trained when real data is
available (drop-in: the loaders just yield (window, label) / (head,
scale, shift) pairs).
"""

import numpy as np

# Distinct per-barcode adapter signatures: each barcode modulates the
# adapter current with a characteristic low-frequency pattern.
BARCODE_FREQS = [0.011, 0.023, 0.037, 0.053]
BARCODE_AMPS = [6.0, 5.0, 4.5, 5.5]


def make_adapter_window(rng, barcode, trim_length=300):
    """One med/MAD-normalized adapter window. barcode: -1 for decoy (random
    signal), 0..3 for barcodes."""
    t = np.arange(trim_length)
    base = rng.normal(80.5, 5.0, trim_length)
    if barcode >= 0:
        base += BARCODE_AMPS[barcode] * np.sin(
            2 * np.pi * BARCODE_FREQS[barcode] * t +
            rng.uniform(0, 2 * np.pi))
        base += BARCODE_AMPS[barcode] * 0.6 * np.sign(
            np.sin(2 * np.pi * BARCODE_FREQS[barcode] * 0.5 * t))
    med = np.median(base)
    mad = np.median(np.abs(base - med))
    return ((base - med) / max(0.01, mad * 1.4826)).astype(np.float32)


def demux_dataset(n_per_class, rng, trim_length=300, decoy_fraction=0.2):
    """Returns (windows [N, T], labels [N]) with label 0 = decoy,
    1..4 = barcodes (the reference's label layout: decoys first,
    poreplex/barcoding.py:108)."""
    windows, labels = [], []
    n_decoy = int(n_per_class * 4 * decoy_fraction)
    for _ in range(n_decoy):
        windows.append(make_adapter_window(rng, -1, trim_length))
        labels.append(0)
    for bc in range(4):
        for _ in range(n_per_class):
            windows.append(make_adapter_window(rng, bc, trim_length))
            labels.append(bc + 1)
    order = rng.permutation(len(windows))
    return (np.stack(windows)[order],
            np.asarray(labels, np.int32)[order])


def scaler_dataset(n, rng, pooled_length=2000, stride=15):
    """Signal heads + ground-truth (scale, shift) targets: a canonical
    pore-model-space head is generated, then distorted by the inverse of a
    random per-read (scale, shift); the network must recover the affine
    correction (the reference's regression target,
    training/signal-scaling/scripts/learn-scaling.py)."""
    heads = np.zeros((n, pooled_length), np.float32)
    targets = np.zeros((n, 2), np.float32)
    for i in range(n):
        scale = rng.normal(0.955, 0.074)     # matches output_transform stats
        shift = rng.normal(5.50, 5.46)
        nstates = pooled_length // 20
        levels = rng.normal(92.0, 12.0, nstates)
        canonical = np.repeat(levels, 20)[:pooled_length] + \
            rng.normal(0, 2.0, pooled_length)
        # distorted raw signal: canonical = scale * raw + shift
        raw = (canonical - shift) / scale
        pad = rng.randint(0, pooled_length // 3) if rng.uniform() < 0.3 else 0
        if pad:
            raw[:pad] = 0.0
        heads[i] = raw
        targets[i] = (scale, shift)
    return heads, targets
