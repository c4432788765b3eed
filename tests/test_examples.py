"""The example gallery must stay runnable (VERDICT round 2, missing #4)."""

import os
import subprocess
import sys

import pytest

EXAMPLE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       'examples', 'quickstart.py')


@pytest.mark.slow
def test_quickstart_runs(tmp_path):
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    out = subprocess.run([sys.executable, EXAMPLE, '--plot', str(tmp_path)],
                         capture_output=True, text=True, timeout=900, env=env)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert 'quickstart: all sections ran.' in out.stdout
    # at least the main figures were written
    pngs = {p.name for p in tmp_path.iterdir() if p.suffix == '.png'}
    assert {'background.png', 'pk_engines.png', 'nonlinear.png'} <= pngs
