"""Protect the driver contract: entry() compiles, dryrun_multichip runs."""

import sys

import jax
import pytest


@pytest.mark.slow
def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 256, 256, 3)


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_bench_importable():
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.main)
