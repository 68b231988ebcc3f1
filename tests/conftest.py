"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4: multi-host behavior testable via
xla_force_host_platform_device_count)."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('CUDA_VISIBLE_DEVICES', '-1')
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')

import pathlib

import numpy as np
import pytest

# In this environment the 'axon' TPU plugin registers itself regardless of
# JAX_PLATFORMS, and jax.devices() returns the real TPU. Force all test
# computation onto the virtual 8-device CPU backend explicitly.
import jax

jax.config.update('jax_default_device', jax.devices('cpu')[0])


@pytest.fixture(scope='session')
def cpu_devices():
    return jax.devices('cpu')

TESTS_DIR = pathlib.Path(__file__).parent
GOLDEN_DIR = TESTS_DIR / 'golden'
PRESETS_DIR = TESTS_DIR.parent / 'poreplex_tpu' / 'presets'


@pytest.fixture(scope='session')
def nn_goldens():
    return np.load(GOLDEN_DIR / 'nn_goldens.npz')


@pytest.fixture(scope='session')
def scaler_model_path():
    return str(PRESETS_DIR / 'MIN106-RNA001' / 'scaler-r3.npz')


@pytest.fixture(scope='session')
def demux_model_path():
    return str(PRESETS_DIR / 'MIN106-RNA001' / 'demux-tetra-r4.npz')
