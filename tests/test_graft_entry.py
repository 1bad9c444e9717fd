"""The driver-facing entry points must keep working (compile-checked by the
round driver): entry() single-chip forward and dryrun_multichip on the
virtual 8-device CPU mesh."""

import importlib.util
import os

import jax


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_jits():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 25, 66)


def test_dryrun_multichip_8():
    m = _load()
    m.dryrun_multichip(8)
