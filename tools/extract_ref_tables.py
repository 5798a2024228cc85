"""Extract numeric data tables from the reference repo into .npz files.

The reference (CartwrightLab/coati) ships several numeric constant tables:
  - ECM exchangeabilities + stationary frequencies (Kosiol et al. 2007),
    /root/reference/src/include/coati/ecm_unrest.tcc:28,581
  - Golden MG94 P matrix at t=0.0133 for tests,
    /root/reference/src/include/coati/mg94p.tcc:26
  - Sparse MG94 Q (index/value arrays) for tests,
    /root/reference/src/include/coati/mg94q.tcc:26

These are published scientific data (Kosiol 2007 supplemental / Muse-Gaut
model outputs), not code; we extract the numbers only.

Run from repo root:  python tools/extract_ref_tables.py
"""

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/src/include/coati")
REPO = Path(__file__).resolve().parent.parent


def extract_initializer(text: str, name: str) -> list[float]:
    """Extract the numbers of a C array initializer `name... = { ... };`."""
    # find the declaration
    m = re.search(rf"{name}\s*(\[\d+\])*\s*[={{]", text)
    if not m:
        raise ValueError(f"{name} not found")
    start = text.index("{", m.start())
    depth = 0
    end = None
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                end = i
                break
    body = text[start : end + 1]
    # strip comments
    body = re.sub(r"/\*.*?\*/", " ", body, flags=re.S)
    body = re.sub(r"//[^\n]*", " ", body)
    toks = re.findall(r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?", body)
    return [float(t) for t in toks]


def main() -> int:
    data_dir = REPO / "coati_tpu" / "data"
    tests_dir = REPO / "tests" / "data"
    data_dir.mkdir(parents=True, exist_ok=True)
    tests_dir.mkdir(parents=True, exist_ok=True)

    ecm_text = (REF / "ecm_unrest.tcc").read_text()
    exchang = np.array(extract_initializer(ecm_text, "exchang"), dtype=np.float64)
    assert exchang.size == 61 * 61, exchang.size
    exchang = exchang.reshape(61, 61)
    ecm_pi = np.array(extract_initializer(ecm_text, "ecm_pi"), dtype=np.float64)
    assert ecm_pi.size == 61, ecm_pi.size
    np.savez(data_dir / "ecm.npz", exchang=exchang, ecm_pi=ecm_pi)

    p_text = (REF / "mg94p.tcc").read_text()
    mg94p = np.array(extract_initializer(p_text, "mg94P"), dtype=np.float64)
    assert mg94p.size == 61 * 61, mg94p.size
    np.save(tests_dir / "mg94p_golden.npy", mg94p.reshape(61, 61))

    q_text = (REF / "mg94q.tcc").read_text()
    idx = np.array(extract_initializer(q_text, "mg94_indexes"), dtype=np.int64)
    vals = np.array(extract_initializer(q_text, "mg94Q"), dtype=np.float64)
    assert idx.size == 587 and vals.size == 587, (idx.size, vals.size)
    np.savez(tests_dir / "mg94q_golden.npz", indexes=idx, values=vals)

    print("wrote", data_dir / "ecm.npz", tests_dir / "mg94p_golden.npy", tests_dir / "mg94q_golden.npz")
    return 0


if __name__ == "__main__":
    sys.exit(main())
