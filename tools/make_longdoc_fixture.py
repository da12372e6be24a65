"""Long-document variant fixture for the jaccard verify-stage profile
(VERDICT r7 item 4): tiles each document's token stream `tiles` times,
suffixing every token with its tile index (`word` -> `word~3`), and
writes ONLY documents.parquet to the output dir.

Per-tile suffixes keep the tiles (almost) disjoint in 3-shingle space,
so n_sh grows ~`tiles`x while pairwise Jaccard is approximately
preserved: two near-dups stay near-dups tile by tile, and a ~500-token
corpus with the SAME near-dup density as the source emerges — exactly
the regime where a per-pair suffix probe in the verify stage would have
something to save. Deterministic, no RNG.

usage: make_longdoc_fixture.py [src_sf_dir] [out_dir] [tiles]
"""
from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def tile_text(text: str, tiles: int) -> str:
    toks = text.strip().split()
    return " ".join(f"{tok}~{k}" for k in range(tiles) for tok in toks)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = sys.argv[1:]
    if any(a.startswith("-") and not a.lstrip("-").isdigit() for a in args):
        sys.exit(f"usage: {sys.argv[0]} [src_sf_dir] [out_dir] [tiles]\n"
                 f"(positional args only; got {args!r})")
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    if not os.path.isdir(src):
        sys.exit(f"src dir not found: {src!r}")
    out = (args[1] if len(args) > 1
           else os.path.join(repo, ".benchdata",
                             os.path.basename(src.rstrip("/")) + "-longdoc"))
    tiles = int(args[2]) if len(args) > 2 else 10
    if tiles < 1:
        sys.exit(f"tiles must be >= 1, got {tiles}")
    os.makedirs(out, exist_ok=True)

    t = pq.read_table(os.path.join(src, "documents.parquet"))
    texts = [tile_text(s, tiles) for s in t["text"].to_pylist()]
    idx = t.schema.get_field_index("text")
    t = t.set_column(idx, t.schema.field("text"),
                     pa.array(texts, type=t.schema.field("text").type))
    if "n_chars" in t.schema.names:
        nidx = t.schema.get_field_index("n_chars")
        t = t.set_column(
            nidx, t.schema.field("n_chars"),
            pa.array([len(s) for s in texts],
                     type=t.schema.field("n_chars").type))
    pq.write_table(t, os.path.join(out, "documents.parquet"))
    n_toks = sum(len(s.split()) for s in texts) / max(1, len(texts))
    print(f"wrote {t.num_rows} docs x {tiles} tiles "
          f"(avg {n_toks:.0f} tokens) -> {out}")


if __name__ == "__main__":
    main()
