"""Native kernels must run clean under ASan/UBSan (SURVEY.md section 5:
the reference has no sanitizer coverage; its C++ layer carries a real
thread-safety hazard -- shared wavelet buffers, ``fm_index.cpp:38-40``.
Our kernels are single-threaded by design; this guards the memory-safety
surface with randomized inputs + brute-force oracles)."""

import shutil
import subprocess
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / "run_sanitizers.sh"


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++ toolchain")
def test_native_kernels_under_sanitizers():
    proc = subprocess.run(
        ["bash", str(SCRIPT)], capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "all native-kernel checks passed" in proc.stdout
