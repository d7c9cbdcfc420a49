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


def test_cli_logical(tmp_path):
    """logical subcommand: compressed-domain OR of three files."""
    import numpy as np

    from conftest import random_bitmap
    from wah_tpu.__main__ import main

    cols = [random_bitmap(992 + 37, d, seed=80 + i)
            for i, d in enumerate([1 / 16, 0.3, 0.0])]
    paths = []
    for i, c in enumerate(cols):
        p = tmp_path / f"c{i}.bin"
        p.write_bytes(c.astype("<u4").tobytes())
        main(["compress", str(p), "-o", str(p) + ".wah", "--kernel", "xla"])
        paths.append(str(p) + ".wah")
    out = str(tmp_path / "or.wah")
    main(["logical", "or", *paths, "-o", out, "--kernel", "xla"])
    dec = str(tmp_path / "or.bin")
    main(["decompress", out, "-o", dec, "--kernel", "xla"])
    got = np.frombuffer(open(dec, "rb").read(), dtype="<u4")
    np.testing.assert_array_equal(got, cols[0] | cols[1] | cols[2])
