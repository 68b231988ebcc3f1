"""Small host-side utilities."""

import os
import sys


def errprint(*args, **kwargs):
    kwargs.setdefault('file', sys.stderr)
    print(*args, **kwargs)


def errx(message):
    errprint(message)
    sys.exit(1)


def ensure_dir_exists(filepath):
    """Create the parent directory of a file path when missing
    (role of poreplex/utils.py:50-56)."""
    dirname = os.path.dirname(filepath)
    if dirname and not os.path.isdir(dirname):
        os.makedirs(dirname, exist_ok=True)
