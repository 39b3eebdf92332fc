"""Index inspection / integrity checking CLI — the `indextool` analog
(/root/reference/src/indextool.cpp: --check, --dumpheader, --dumpdict).

Usage:
    python -m manticoresearch_tpu.tools.indextool --check PATH
    python -m manticoresearch_tpu.tools.indextool --dumpheader PATH
    python -m manticoresearch_tpu.tools.indextool --dumpdict PATH [--limit N]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def check_index(path: str) -> list[str]:
    """Structural validation (DebugCheckHelper_c analog,
    indexcheck.cpp:1418). Returns a list of error strings."""
    from ..index.storage import load_packed

    errors: list[str] = []
    p = load_packed(path)

    def chk(cond, msg):
        if not cond:
            errors.append(msg)

    n, P, H, T = p.n_docs, p.n_postings, len(p.hit_packed), p.n_terms
    chk(len(p.doc_ids) == n, "doc_ids length != n_docs")
    chk(bool(np.all(np.diff(p.doc_ids) > 0)) if n > 1 else True,
        "doc_ids not strictly ascending")
    chk(len(p.term_offsets) == T + 1, "term_offsets length != n_terms+1")
    chk(int(p.term_offsets[0]) == 0 and int(p.term_offsets[-1]) == P,
        "term_offsets bounds broken")
    chk(bool(np.all(np.diff(p.term_offsets) >= 0)),
        "term_offsets not monotonic")
    chk(p.term_strs == sorted(p.term_strs), "dictionary not sorted")
    chk(bool(np.all(np.diff(p.post_hit_offset) >= 0)),
        "post_hit_offset not monotonic")
    chk(int(p.post_hit_offset[-1]) == H, "hit offsets do not cover hitlist")
    if P:
        chk(bool(np.all((p.post_rowid >= 0) & (p.post_rowid < max(n, 1)))),
            "posting rowid out of range")
        chk(bool(np.all(p.post_tf >= 1)), "posting tf < 1")
        # per-term rowids ascending
        for t in range(T):
            a, b = int(p.term_offsets[t]), int(p.term_offsets[t + 1])
            if b - a > 1 and not np.all(np.diff(p.post_rowid[a:b]) > 0):
                errors.append(f"term {p.term_strs[t]!r}: rowids not ascending")
                break
        chk(bool(np.all(np.diff(p.post_hit_offset) == p.post_tf)),
            "tf != hitlist segment size")
        tfq = p.post_tf / (p.post_tf + np.float32(1.2))
        chk(bool(np.allclose(p.post_tfq, tfq.astype(np.float32))),
            "eager tf/(tf+K1) mismatch")
    df = np.diff(p.term_offsets)
    chk(bool(np.all(df == p.term_docs)), "df != posting counts")
    return [e for e in errors if e]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="index inspection tool")
    ap.add_argument("--check", metavar="PATH")
    ap.add_argument("--dumpheader", metavar="PATH")
    ap.add_argument("--dumpdict", metavar="PATH")
    ap.add_argument("--limit", type=int, default=100)
    args = ap.parse_args(argv)

    from ..index.storage import load_packed

    if args.check:
        errors = check_index(args.check)
        if errors:
            for e in errors:
                print(f"FAILED: {e}")
            return 1
        print("check passed")
        return 0
    if args.dumpheader:
        import json as _json
        with open(f"{args.dumpheader}/header.json") as f:
            print(_json.dumps(_json.load(f), indent=2))
        return 0
    if args.dumpdict:
        p = load_packed(args.dumpdict)
        print("term\tdocs\thits")
        for i, t in enumerate(p.term_strs[: args.limit]):
            print(f"{t}\t{int(p.term_docs[i])}\t{int(p.term_hits[i])}")
        return 0
    ap.error("one of --check/--dumpheader/--dumpdict required")
    return 2


if __name__ == "__main__":
    sys.exit(main())
