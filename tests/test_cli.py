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
