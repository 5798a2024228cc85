"""Generate the sampledata byte-parity goldens (run once, outputs checked in).

Drives every case in tests/sampledata_cases.py through the CLI on the CPU
backend and stores each artifact under tests/data/sampledata_golden/.
Regenerate ONLY when an intentional behavior change is made, and re-verify
the anchor values (e.g. example-001 mar-mg score 1.5091344) against the
reference fixtures before committing.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
os.environ["COATI_TPU_FORCE_PLATFORM"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

from sampledata_cases import CASES, SAMPLEDATA, SCORE_CASES  # noqa: E402

GOLDEN = REPO / "tests" / "data" / "sampledata_golden"


def run_cli(argv):
    from coati_tpu.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    return rc, buf.getvalue()


def main() -> int:
    GOLDEN.mkdir(parents=True, exist_ok=True)
    for name, argv, artifact in CASES:
        with tempfile.TemporaryDirectory() as td:
            av = [a.format(sd=SAMPLEDATA, out=td) for a in argv]
            rc, out = run_cli(av)
            assert rc == 0, (name, rc)
            if artifact:
                data = (Path(td) / artifact).read_bytes()
            else:
                data = out.encode()
            dst = GOLDEN / f"{name}__{artifact or 'stdout.txt'}"
            dst.write_bytes(data)
            print(f"{name}: {len(data)} bytes -> {dst.name}")

    for name, src_case, argv in SCORE_CASES:
        src_name, src_art = next(
            (n, a) for n, _, a in CASES if n == src_case
        )
        aligned = GOLDEN / f"{src_name}__{src_art}"
        av = [a.format(sd=SAMPLEDATA, aligned=str(aligned)) for a in argv]
        rc, out = run_cli(av)
        assert rc == 0, (name, rc, out)
        dst = GOLDEN / f"{name}__stdout.txt"
        dst.write_bytes(out.encode())
        print(f"{name}: {out.strip()!r} -> {dst.name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
