"""CLI smoke tests (lizard-compatible argument surface)."""

import os
import sys

import pytest

from lizard_tpu.cli import main, parse_args
from lizard_tpu.utils.datagen import gen


def test_parse_level_digits():
    o = parse_args(["-29", "-z", "file"])
    assert o.level == 29 and o.mode == "compress"
    o = parse_args(["-B5D", "file"])
    assert o.block_size_id == 5 and o.block_linked


def test_roundtrip_files(tmp_path):
    src = tmp_path / "data.bin"
    data = gen(50_000, 3)
    src.write_bytes(data)
    assert main(["-z", "-12", str(src)]) == 0
    liz = tmp_path / "data.bin.liz"
    assert liz.exists()
    os.remove(src)
    assert main(["-d", str(liz)]) == 0
    assert src.read_bytes() == data


def test_test_mode(tmp_path):
    src = tmp_path / "x"
    src.write_bytes(gen(10_000, 1))
    main(["-z", str(src)])
    assert main(["-t", str(src) + ".liz"]) == 0


def test_no_overwrite(tmp_path):
    src = tmp_path / "y"
    src.write_bytes(b"hello world" * 100)
    main(["-z", str(src)])
    with pytest.raises(SystemExit):
        main(["-z", str(src)])
    assert main(["-z", "-f", str(src)]) == 0


def test_stdout_mode(tmp_path, capsysbinary):
    src = tmp_path / "z"
    data = gen(5_000, 2)
    src.write_bytes(data)
    main(["-z", "-c", str(src)])
    frame = capsysbinary.readouterr().out
    from lizard_tpu.frame import decompress_frame
    assert decompress_frame(frame) == data


def test_truncated_frame_detected(tmp_path):
    """`-t` and `-d` must fail on truncated frames, including a truncated
    second frame after a complete one (lizardio rejects unfinished streams)."""
    import subprocess
    import sys as _sys
    from lizard_tpu.frame import compress_frame
    from lizard_tpu.utils.datagen import gen
    data = gen(100000, seed=3, proba=0.7)
    frame = compress_frame(data, 11)
    bad = tmp_path / "bad.liz"
    bad.write_bytes(frame[:len(frame) // 2])
    r = subprocess.run([_sys.executable, "-m", "lizard_tpu.cli", "-t",
                        str(bad)], capture_output=True, cwd="/root/repo")
    assert r.returncode != 0
    bad2 = tmp_path / "bad2.liz"
    bad2.write_bytes(frame + frame[:len(frame) // 2])
    r = subprocess.run([_sys.executable, "-m", "lizard_tpu.cli", "-t",
                        str(bad2)], capture_output=True, cwd="/root/repo")
    assert r.returncode != 0


def test_trailing_fragment_rejected(tmp_path):
    """A complete frame followed by a <7-byte tail (an incomplete next-frame
    header) must fail -t/-d, not silently drop the tail bytes."""
    src = tmp_path / "w"
    src.write_bytes(gen(10_000, 4))
    main(["-z", str(src)])
    liz = tmp_path / "w.liz"
    liz.write_bytes(liz.read_bytes() + b"\x04\x22\x4d\x18\x40")  # 5-byte tail
    with pytest.raises(ValueError):
        main(["-t", str(liz)])
    with pytest.raises(ValueError):
        main(["-d", "-f", str(liz), str(tmp_path / "w.out")])


def test_passthrough_unknown_magic(tmp_path):
    """lizardio.c:779-788: unknown leading magic passes through with -d -f,
    errors without -f, and always errors in test mode."""
    raw = tmp_path / "notliz.liz"
    payload = b"PLAINDATA" * 100
    raw.write_bytes(payload)
    out = tmp_path / "notliz"
    with pytest.raises(SystemExit):
        main(["-d", str(raw), str(out)])
    with pytest.raises(SystemExit):
        main(["-t", "-f", str(raw)])
    assert main(["-d", "-f", str(raw), str(out)]) == 0
    assert out.read_bytes() == payload


def test_native_max_out_high_ratio(tmp_path, monkeypatch):
    """cli backend=native: frames compressing >256:1 must still decode via
    the native path's header-derived output bound (not a len*256 guess)."""
    from lizard_tpu import runtime
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    src = tmp_path / "zeros"
    data = bytes(4 << 20)  # 4 MB of zeros: ratio >> 256:1
    src.write_bytes(data)
    monkeypatch.setenv("LIZARD_TPU_BACKEND", "native")
    assert main(["-z", "-10", str(src)]) == 0
    os.remove(src)
    assert main(["-d", str(src) + ".liz"]) == 0
    assert src.read_bytes() == data


def test_cli_chunked_roundtrip_constant_memory(tmp_path):
    """Large-ish file streams through the 64 KB loop; output matches."""
    from lizard_tpu.utils.datagen import gen
    data = gen(700_000, 77, proba=0.6)
    src = tmp_path / "big.bin"
    src.write_bytes(data)
    assert main(["-z", "-12", "-f", str(src), str(tmp_path / "big.liz")]) == 0
    assert main(["-d", "-f", str(tmp_path / "big.liz"),
                 str(tmp_path / "big.out")]) == 0
    assert (tmp_path / "big.out").read_bytes() == data


def test_cli_sparse_writer(tmp_path):
    """Zero runs in decompressed output become file holes."""
    data = b"head" + bytes(1_000_000) + b"tail"
    src = tmp_path / "holes.bin"
    src.write_bytes(data)
    assert main(["-z", "-11", "-f", str(src)]) == 0
    out = tmp_path / "holes.out"
    assert main(["-d", "-f", str(src) + ".liz", str(out)]) == 0
    assert out.read_bytes() == data
    import os as _os
    st = _os.stat(out)
    # a sparse file occupies far fewer blocks than its size
    if st.st_blocks * 512 < len(data):
        pass  # hole punched (filesystem-dependent; content is the contract)


def test_cli_rm_removes_source(tmp_path):
    from lizard_tpu.utils.datagen import gen
    data = gen(10_000, 5, proba=0.6)
    src = tmp_path / "x.bin"
    src.write_bytes(data)
    assert main(["-z", "-11", "-f", "--rm", str(src)]) == 0
    assert not src.exists()
    liz = tmp_path / "x.bin.liz"
    assert liz.exists()
    assert main(["-d", "-f", "--rm", str(liz), str(tmp_path / "x.out")]) == 0
    assert not liz.exists()
    assert (tmp_path / "x.out").read_bytes() == data


def test_cli_recursive(tmp_path):
    from lizard_tpu.utils.datagen import gen
    d = tmp_path / "dir" / "sub"
    d.mkdir(parents=True)
    files = {}
    for i in range(3):
        p = d / f"f{i}.bin"
        content = gen(5_000 + i, i, proba=0.6)
        p.write_bytes(content)
        files[p] = content
    assert main(["-z", "-r", "-11", "-f", str(tmp_path / "dir")]) == 0
    for p, content in files.items():
        liz = p.with_name(p.name + ".liz")
        assert liz.exists(), liz
        assert main(["-d", "-f", str(liz), str(p) + ".back"]) == 0
        import pathlib
        assert pathlib.Path(str(p) + ".back").read_bytes() == content


def test_cli_linked_streaming_roundtrip(tmp_path):
    from lizard_tpu.utils.datagen import gen
    data = gen(300_000, 9, proba=0.5)
    src = tmp_path / "l.bin"
    src.write_bytes(data)
    assert main(["-z", "-12", "-B1", "-BD", "-f", str(src)]) == 0
    out = tmp_path / "l.out"
    assert main(["-d", "-f", str(src) + ".liz", str(out)]) == 0
    assert out.read_bytes() == data


def test_cli_content_size_streaming(tmp_path):
    from lizard_tpu.utils.datagen import gen
    data = gen(50_000, 4, proba=0.6)
    src = tmp_path / "cs.bin"
    src.write_bytes(data)
    assert main(["-z", "-11", "--content-size", "-f", str(src)]) == 0
    out = tmp_path / "cs.out"
    assert main(["-d", "-f", str(src) + ".liz", str(out)]) == 0
    assert out.read_bytes() == data
