"""File CLI (python -m wah_tpu) roundtrip + format tests."""
import numpy as np
import pytest

from wah_tpu import __main__ as cli
from wah_tpu import native


def _roundtrip(tmp_path, kernel, nbytes=40001):
    rng = np.random.default_rng(7)
    raw = (rng.random(nbytes // 4 + 1) < 0.02).astype("<u4").tobytes()[:nbytes]
    src = tmp_path / "bm.bin"
    src.write_bytes(raw)
    wah = tmp_path / "bm.wah"
    out = tmp_path / "bm.out"
    cli.main(["compress", str(src), "-o", str(wah), "--kernel", kernel])
    cli.main(["info", str(wah)])
    cli.main(["decompress", str(wah), "-o", str(out), "--kernel", kernel])
    assert out.read_bytes() == raw


def test_cli_roundtrip_xla(tmp_path):
    _roundtrip(tmp_path, "xla")


def test_cli_roundtrip_native(tmp_path):
    if not native.available():
        pytest.skip("no native toolchain")
    _roundtrip(tmp_path, "native")


def test_cli_streams_identical_across_kernels(tmp_path):
    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(9)
    raw = (rng.random(5000) < 0.1).astype("<u4").tobytes()
    src = tmp_path / "b.bin"
    src.write_bytes(raw)
    a, b = tmp_path / "a.wah", tmp_path / "b.wah"
    cli.main(["compress", str(src), "-o", str(a), "--kernel", "xla"])
    cli.main(["compress", str(src), "-o", str(b), "--kernel", "native"])
    assert a.read_bytes() == b.read_bytes()


def test_cli_rejects_bad_magic(tmp_path):
    bad = tmp_path / "x.wah"
    bad.write_bytes(b"NOPE" + b"\0" * 28)
    with pytest.raises(SystemExit):
        cli.main(["info", str(bad)])
