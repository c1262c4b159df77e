#!/usr/bin/env python3
"""Synthesize a larger scale factor from sf0.1 by unioning N
consistently key-shifted copies (the r11/r13 rehearsal recipe, made
durable). Every key column is dense 0..card-1 in the driver's
testdata, so per-copy offsets = the table cardinality, rounded up to
a multiple of 50 (region 5->50, nation 25->50) so `% 50`-style probe
predicates keep their residues. Foreign keys shift by the REFERENCED
table's offset, so the star schema stays consistent per copy.

Usage: make_scaled_sf.py <copies> <out_dir> [src_dir=/root/testdata/sf0.1]
         [--no-order] [--perturb] [--tables t1,t2] [--link-from dir]
e.g.   make_scaled_sf.py 100 /tmp/sf10   # = sf10, ~1.7 GB

--tables restricts synthesis to a comma-list (validated against the
known table set — a typo errors out instead of silently skipping).
With --link-from <same-scale sibling dir>, the tables NOT listed are
symlinked from there so the output dir is complete (e.g. a perturbed
variant of an existing unperturbed dir only differs in
documents,embeddings — synthesize those two, link the other eight,
~16 GB saved at sf100).

--no-order skips the ORDER BY i that keeps copies contiguous (a
row-group-pruning nicety for `% m` shard predicates, irrelevant to
correctness): at copies >= 1000 the 600M-row lineitem sort would
spill for no benefit.

--perturb (r13 verdict #4) de-clones the CONTENT columns so near-dup
fixtures stop being quadratic-by-artifact (1000 identical text/vector
copies make every cross-copy pair a duplicate — pair output quadratic
in copies, a synthetic artifact the real engine path never sees):
 - documents.text: every token gets a per-copy tag prefix (c<i>_) — a
   bijective per-copy token map, so WITHIN a copy every TOKEN-IDENTITY
   measure (token-set / token-shingle Jaccard and overlap — the MinHash
   and n-gram-shingle fixtures) is preserved exactly, while across
   copies shingle sets share nothing. Measures that read token BYTES
   rather than token identity are NOT invariant (SimHash bit distances
   between non-identical docs, character-level n-grams): every token's
   bytes change under the c<i>_ prefix. n_chars is recomputed to keep
   the generator's n_chars = length(text) invariant;
 - embeddings.embedding: dimensions rotated by (copy %% dim), dim
   derived from len(embedding) per row — norms and within-copy cosines
   are preserved exactly (same rotation both sides of any within-copy
   pair), cross-copy cosines decorrelate. Copies `dim` apart repeat
   the rotation, so residual exact-clone groups are bounded at
   ~copies/dim per source vector — linear, not the all-copies clique.
Unperturbed runs stay the default so walls remain comparable with the
r13 ladder artifacts.
"""
import os
import sys

import duckdb

# offsets keyed by the BASE table whose key space they extend.
# (lineitem itself has no key of its own to shift — its l_orderkey /
# l_partkey / l_suppkey shift by the referenced tables' offsets.)
OFF = {"region": 50, "nation": 50, "customer": 15000, "supplier": 1000,
       "part": 20000, "orders": 150000,
       "events": 100000, "events_user": 1500, "documents": 5000,
       "embeddings": 2000}

# table -> [(column, base_offset_key)]; unlisted columns pass through
SHIFTS = {
    "region":    [("r_regionkey", "region")],
    "nation":    [("n_nationkey", "nation"), ("n_regionkey", "region")],
    "customer":  [("c_custkey", "customer"), ("c_nationkey", "nation")],
    "supplier":  [("s_suppkey", "supplier"), ("s_nationkey", "nation")],
    "part":      [("p_partkey", "part")],
    "orders":    [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem":  [("l_orderkey", "orders"), ("l_partkey", "part"),
                  ("l_suppkey", "supplier")],
    "events":    [("event_id", "events"), ("user_id", "events_user")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

_TEXT = "regexp_replace(text, '(\\S+)', 'c' || i || '_\\1', 'g')"
# content-column rewrites under --perturb; keyed (table, column)
PERTURB = {
    ("documents", "text"): f"{_TEXT} AS text",
    ("documents", "n_chars"): f"CAST(length({_TEXT}) AS BIGINT) AS n_chars",
    # rotation amount i % len(embedding): dim-derived, not hardcoded
    # (r14 advice #3 — a non-64-dim fixture would otherwise silently
    # produce wrong-length arrays)
    ("embeddings", "embedding"):
        "CASE WHEN i % len(embedding) = 0 THEN embedding "
        "ELSE CAST(embedding[(i % len(embedding) + 1):len(embedding)] "
        "|| embedding[1:(i % len(embedding))] AS FLOAT[]) "
        "END AS embedding",
}


def main(copies: int, out_dir: str, src: str, order: bool,
         perturb: bool, tables: list[str] | None,
         link_from: str | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for table, shifts in SHIFTS.items():
        if tables and table not in tables:
            # --link-from <same-scale sibling dir>: symlink the tables
            # NOT being synthesized so the output dir is complete
            # without the manual step the docstring used to require
            # (r15 advice #3). The link source must be the SAME SCALE
            # (e.g. the unperturbed sf100 dir when synthesizing a
            # perturbed sf100 variant) — never `src`, which is the
            # sf0.1 seed.
            if link_from:
                dst = f"{out_dir}/{table}.parquet"
                s = os.path.abspath(f"{link_from}/{table}.parquet")
                if not os.path.exists(s):
                    sys.exit(f"--link-from: {s} does not exist")
                if not os.path.exists(dst):
                    os.symlink(s, dst)
                    print(f"{table}: symlinked from {s}", flush=True)
            continue
        f = f"{src}/{table}.parquet"
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{f}')").fetchall()]
        shifted = dict(shifts)
        sel = ", ".join(
            PERTURB[(table, c)] if perturb and (table, c) in PERTURB
            else f"{c} + i * {OFF[shifted[c]]} AS {c}" if c in shifted
            else c
            for c in cols)
        ob = " ORDER BY i" if order else ""
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{f}'), "
            f"range({copies}) t(i){ob}) "
            f"TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows", flush=True)


if __name__ == "__main__":
    argv = sys.argv[1:]
    tables = None
    if "--tables" in argv:
        i = argv.index("--tables")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            sys.exit("--tables needs a comma-separated value, e.g. "
                     "--tables documents,embeddings")
        tables = argv[i + 1].split(",")
        # a typo like 'document' must not silently produce an output
        # dir missing that table with exit 0 (r15 advice #3)
        unknown = [t for t in tables if t not in SHIFTS]
        if unknown:
            sys.exit(f"--tables: unknown table(s) {unknown}; "
                     f"known: {sorted(SHIFTS)}")
        argv = argv[:i] + argv[i + 2:]
    link_from = None
    if "--link-from" in argv:
        i = argv.index("--link-from")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            sys.exit("--link-from needs a directory value")
        link_from = argv[i + 1]
        if not os.path.isdir(link_from):
            sys.exit(f"--link-from: {link_from} is not a directory")
        argv = argv[:i] + argv[i + 2:]
    if link_from and not tables:
        sys.exit("--link-from only makes sense with --tables")
    flags = {"--no-order", "--perturb"}
    args = [a for a in argv if a not in flags]
    main(int(args[0]), args[1],
         args[2] if len(args) > 2 else "/root/testdata/sf0.1",
         order="--no-order" not in argv,
         perturb="--perturb" in argv,
         tables=tables, link_from=link_from)
