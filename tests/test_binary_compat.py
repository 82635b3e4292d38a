"""Byte-level .bin compatibility with the reference text→binary converter.

The reference ships its φφ tables as float32 binaries produced by
``xsec/text_to_binary.cpp``; the actual ``.bin`` files are absent from the
snapshot ("available upon request"), so round-tripping our own writer
cannot detect a byte-order or row-order mix-up versus the real files.
This test closes that hole by running the GENUINE reference converter:
it copies ``text_to_binary.cpp`` to a tmpdir with only the two hardcoded
row-count constants scaled down (the full-size alpha table is 1e8 rows /
1.6 GB — infeasible in a unit test; the parsing/packing code is
untouched), compiles it with g++, feeds it ``.dat`` text in the
``tables_phiphi.py`` row order, and asserts:

  1. the reference-written ``.bin`` is byte-identical to our
     ``pp_tables.save_binary`` output for the same data, and
  2. ``pp_tables.load_binary`` recovers grids and values exactly.

Skipped when /root/reference or g++ is unavailable.
"""

import os
import re
import shutil
import subprocess

import numpy as np
import pytest

from nusiprop_tpu.models import pp_tables

REF_CPP = "/root/reference/xsec/text_to_binary.cpp"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_CPP) and shutil.which("g++")),
    reason="reference snapshot or g++ unavailable",
)

# small synthetic grids (same axis conventions as tables_phiphi.py)
AT_SHAPE = (40, 10)
A_SHAPE = (20, 15, 5)


def _synthetic_tables(rng):
    at_tplus = np.geomspace(4.0, 1e4, AT_SHAPE[0])
    at_log10d = np.linspace(0.005, 0.05, AT_SHAPE[1])
    at_values = rng.uniform(1e-30, 1e-2, AT_SHAPE)
    a_splus = np.geomspace(4.0, 1e4, A_SHAPE[0])
    a_n = np.linspace(1.0, 1000.0, A_SHAPE[1])
    a_log10d = np.linspace(0.005, 0.05, A_SHAPE[2])
    a_values = rng.uniform(1e-30, 1e-2, A_SHAPE)
    return (at_tplus, at_log10d, at_values, a_splus, a_n, a_log10d, a_values)


def _write_dat(path, cols):
    """tables_phiphi.py layout: one row per grid point, last axis fastest.
    Columns go through float32 first: 9 significant digits of a float32
    round-trip exactly, so sscanf("%f") recovers the same bits (writing
    the float64 directly can double-round to a neighboring float32)."""
    rows = np.column_stack(
        [c.reshape(-1).astype(np.float32).astype(np.float64) for c in cols])
    with open(path, "w") as f:
        f.write("# synthetic fixture\n")
        for r in rows:
            f.write(" ".join(f"{v:.9g}" for v in r) + "\n")


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("binconv")
    src = open(REF_CPP).read()
    # scale ONLY the two row-count constants to the fixture sizes
    src2 = re.sub(r"n_lines = \d+", f"n_lines = {int(np.prod(A_SHAPE))}",
                  src)
    src2 = re.sub(r"n_lines_tilde = \d+",
                  f"n_lines_tilde = {int(np.prod(AT_SHAPE))}", src2)
    assert src2 != src
    cpp = tmp / "conv.cpp"
    cpp.write_text(src2)
    subprocess.run(["g++", "-O2", "-o", str(tmp / "conv"), str(cpp)],
                   check=True)

    rng = np.random.default_rng(20260817)
    tbl = _synthetic_tables(rng)
    at_tplus, at_log10d, at_values, a_splus, a_n, a_log10d, a_values = tbl

    n1, n2 = AT_SHAPE[1], A_SHAPE[1] * A_SHAPE[2]
    _write_dat(tmp / "alphatilde_phiphi.dat", [
        np.repeat(at_tplus, n1), np.tile(at_log10d, AT_SHAPE[0]),
        at_values])
    _write_dat(tmp / "alpha_phiphi.dat", [
        np.repeat(a_splus, n2),
        np.tile(np.repeat(a_n, A_SHAPE[2]), A_SHAPE[0]),
        np.tile(a_log10d, A_SHAPE[0] * A_SHAPE[1]),
        a_values])
    subprocess.run([str(tmp / "conv")], cwd=tmp, check=True)
    return tmp, tbl


def test_reference_converter_bytes_match_save_binary(converted, tmp_path):
    tmp, tbl = converted
    pp_tables.save_binary(tmp_path / "at.bin", tmp_path / "a.bin", *tbl)
    ours_at = (tmp_path / "at.bin").read_bytes()
    ours_a = (tmp_path / "a.bin").read_bytes()
    refs_at = (tmp / "alphatilde_phiphi.bin").read_bytes()
    refs_a = (tmp / "alpha_phiphi.bin").read_bytes()
    assert len(refs_at) == np.prod(AT_SHAPE) * 3 * 4
    assert len(refs_a) == np.prod(A_SHAPE) * 4 * 4
    assert ours_at == refs_at
    assert ours_a == refs_a


def test_load_binary_recovers_reference_written_tables(converted):
    tmp, tbl = converted
    at_tplus, at_log10d, at_values, a_splus, a_n, a_log10d, a_values = tbl
    pp = pp_tables.load_binary(tmp / "alphatilde_phiphi.bin",
                               tmp / "alpha_phiphi.bin",
                               alphatilde_shape=AT_SHAPE,
                               alpha_shape=A_SHAPE)
    # grids and values survive the text→float32→load pipeline exactly
    np.testing.assert_array_equal(
        np.asarray(pp.alphatilde.values),
        at_values.astype(np.float32).astype(np.float64).reshape(AT_SHAPE))
    np.testing.assert_array_equal(
        np.asarray(pp.alpha.values),
        a_values.astype(np.float32).astype(np.float64).reshape(A_SHAPE))
    # first axis is stored log-reparametrized (reference spec: axis 0
    # logarithmic, nuSIprop.hpp:168-169)
    for spl, axes in ((pp.alphatilde, (at_tplus, at_log10d)),
                      (pp.alpha, (a_splus, a_n, a_log10d))):
        for i, (got, want) in enumerate(zip(spl.nodes, axes)):
            want32 = want.astype(np.float32).astype(np.float64)
            np.testing.assert_array_equal(
                np.asarray(got), np.log(want32) if i == 0 else want32)
