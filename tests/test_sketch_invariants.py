"""Independent (non-replay) gates for the dedup/sketch family
(round-12 verdict item 6).

The DuckDB oracles for ``semantic_dedup_keep`` and
``dedup_keep_best_quality`` REPLAY the same deterministic pipeline in
SQL — cell blocking, sub-cell caps, shingle joins and all — so a
shared-algorithm bug passes both engines.  These tests rebuild the
ground truth from the raw parquet with brute-force numpy / pure-Python
set math: all-pairs cosine with NO cell blocking, all-pairs shingle
Jaccard with NO candidate join, quality scores and canonical picks
with NO window functions.  They gate exactly what the replay oracles
cannot: blocking recall (how much true duplicate mass the blocked plan
finds) and false-merge soundness (a blocked pipeline must never fuse
vectors the unblocked truth keeps apart).

Fixture robustness (checked once, holds for the driver-generated
corpus): the nearest cosine to the 0.3 rounding boundary at sf0.001 is
7e-6 away and the nearest Jaccard to 0.5 is 0.39 away — engine-vs-
numpy float fold-order noise (~1e-15) cannot flip any edge, so the
truth sets below are exact, not approximate.
"""

from __future__ import annotations

import collections
import itertools
import re

import numpy as np
import pyarrow.parquet as pq


def _union_find_components(n_ids, edges):
    """Pure-Python union-find → {id: min-id of its component}."""
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def _true_cosine_truth(sf_dir: str, threshold: float = 0.3):
    """Unblocked all-pairs truth for the semantic-dedup corpus: numpy
    cosine over float64-cast vectors, rounded to the pipeline's 6
    digits, edges at >= threshold, components by union-find."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t["vec_id"].to_pylist()
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)
    C = np.round((V @ V.T) / np.outer(norms, norms), 6)
    n = len(ids)
    edges = [
        (ids[i], ids[j])
        for i in range(n)
        for j in range(i + 1, n)
        if C[i, j] >= threshold
    ]
    return ids, edges, _union_find_components(ids, edges)


def _assert_sound_and_keep_contract(rows, truth):
    """Shared soundness assertions: cell blocking only ever DROPS
    candidate pairs and the rep-sampling bridge only links true >=tau
    pairs, so every pipeline cluster must sit inside one true
    component — a cluster spanning two means the pipeline invented a
    pair.  Plus the keep contract: one keep per cluster, keep ==
    cluster id == min member id."""
    clusters = collections.defaultdict(list)
    for r in rows:
        clusters[r.cluster].append(r)
    for cid, members in clusters.items():
        truth_roots = {truth[m.vec_id] for m in members}
        assert len(truth_roots) == 1, (
            f"false merge: pipeline cluster {cid} spans true "
            f"components {truth_roots}"
        )
        assert sum(1 for m in members if m.keep) == 1
        assert cid == min(m.vec_id for m in members)
        keep = next(m for m in members if m.keep)
        assert keep.vec_id == cid
    return clusters


def test_semantic_dedup_sound_vs_brute_force(spark, sf_dir):
    """semantic_dedup_keep vs the UNBLOCKED numpy truth on the driver
    corpus: soundness exact, recall recorded with a collapse floor.

    The recall number needs honest framing: random 64-dim embeddings
    at tau=0.3 form a sprawling web of barely-above-threshold edges
    whose transitive chains cross cells constantly — the worst case
    for cell blocking.  Measured removable-duplicate recall is 0.305
    here (floor 0.2 = collapse tripwire, not a quality target); the
    quality gate on pairs that MATTER is the planted-near-dup test
    below, where recall is 0.96.  The replay oracle is blind to both
    numbers — it replays the same blocking."""
    from tweets_spark_top_10_spark.queries import QUERIES

    ids, edges, truth = _true_cosine_truth(sf_dir)
    rows = QUERIES["semantic_dedup_keep"](spark, sf_dir).collect()
    assert {r.vec_id for r in rows} == set(ids)
    clusters = _assert_sound_and_keep_contract(rows, truth)

    removable_true = len(ids) - len(set(truth.values()))
    removed = len(ids) - len(clusters)
    assert removable_true > 0, "fixture degenerated: no true duplicates"
    recall = removed / removable_true
    assert recall >= 0.2, f"blocked dedup recall collapsed: {recall:.2f}"


def test_semantic_dedup_planted_near_dup_recall(spark, sf_dir, tmp_path):
    """The recall gate that matters for a dedup pipeline: PLANTED
    near-duplicates (cosine ~0.99995, the SemDeDup target regime) must
    co-cluster.  50 deterministic perturbations of every-10th corpus
    vector; measured 48/50 co-cluster (two sit on a cell-argmax margin
    thinner than the perturbation — inherent to single-probe coarse
    quantization, not a bug), floor 0.9.  Soundness re-asserted on the
    planted corpus against its own numpy truth."""
    import pyarrow as pa

    from tweets_spark_top_10_spark.queries import QUERIES

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t["vec_id"].to_pylist()
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    n_rows = len(ids)
    base_max = max(ids)
    planted = []  # (planted_id, base_index)
    vecs = [V]
    for k, i in enumerate(range(0, n_rows, 10)):
        v = V[i]
        w = np.roll(v, 7)
        w = w - (w @ v) / (v @ v) * v
        nw = np.linalg.norm(w)
        u = v + 1e-2 * np.linalg.norm(v) * (w / nw if nw else w)
        assert (u @ v) / (np.linalg.norm(u) * np.linalg.norm(v)) > 0.999
        planted.append((base_max + 1 + k, i))
        vecs.append(u[None, :])
    allV = np.vstack(vecs).astype(np.float32)
    all_ids = ids + [p[0] for p in planted]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(all_ids, pa.int64()),
                "label": pa.array(
                    [i % 5 for i in range(len(all_ids))], pa.int32()
                ),
                "embedding": pa.array(
                    [list(map(float, r)) for r in allV],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )

    rows = QUERIES["semantic_dedup_keep"](spark, str(tmp_path)).collect()
    _, _, truth = _true_cosine_truth(str(tmp_path))
    _assert_sound_and_keep_contract(rows, truth)

    clus = {r.vec_id: r.cluster for r in rows}
    hits = sum(1 for pid, i in planted if clus[pid] == clus[ids[i]])
    recall = hits / len(planted)
    assert recall >= 0.9, (
        f"planted near-dup recall collapsed: {hits}/{len(planted)}"
    )


# re.ASCII: the engine (Java regex) and oracle (RE2) treat \s as the
# ASCII class; Python's default Unicode \s would also split on
# U+00A0/U+2028 and desync these references on such corpora
_TOKEN_SPLIT = re.compile(r"\s+", re.ASCII)
_PUNCT_STRIP = re.compile(r"[A-Za-z0-9\s]", re.ASCII)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = [t for t in _TOKEN_SPLIT.split(text) if t != ""]
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    } if len(toks) >= n else set()


def _py_quality(text: str) -> float:
    """functions/text.quality_score re-derived from its documented
    formula with str/re only — no Spark expressions."""
    toks = [t for t in _TOKEN_SPLIT.split(text) if t != ""]
    n_tok = len(toks)
    mean_len = (sum(len(t) for t in toks) / n_tok) if n_tok else 0.0
    len_ok = 1.0 if 10 <= n_tok <= 5000 else (0.5 if n_tok > 0 else 0.0)
    tok_ok = 1.0 if 2.0 <= mean_len <= 12.0 else 0.5
    pr = (
        len(_PUNCT_STRIP.sub("", text)) / len(text) if len(text) else 0.0
    )
    punct_ok = 1.0 - min(pr * 4.0, 1.0)
    return round(0.4 * len_ok + 0.3 * tok_ok + 0.3 * punct_ok, 6)


def _true_jaccard_truth(sf_dir: str, threshold: float = 0.5):
    """All-pairs 3-gram Jaccard truth via a Python inverted index —
    no Spark joins, no DF cap (inert at this corpus: no shingle
    reaches df>100), no hashing."""
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = t["doc_id"].to_pylist()
    texts = dict(zip(ids, t["text"].to_pylist()))
    sh = {i: _py_shingles(texts[i]) for i in ids}
    inv = collections.defaultdict(list)
    for i in ids:
        for s in sh[i]:
            inv[s].append(i)
    shared = collections.Counter()
    for docs in inv.values():
        if len(docs) > 1:
            for a, b in itertools.combinations(sorted(docs), 2):
                shared[(a, b)] += 1
    edges = [
        (a, b)
        for (a, b), c in shared.items()
        if c / (len(sh[a]) + len(sh[b]) - c) >= threshold
    ]
    return ids, texts, edges


def test_keep_best_quality_matches_brute_force_truth(spark, sf_dir):
    """dedup_keep_best_quality vs the pure-Python truth.

    At this corpus the DF cap is inert, so the engine's blocked shingle
    join must recover EXACTLY the true >=0.5 pair partition (cluster
    sets equal, not just compatible), and each cluster's canonical must
    be the max-quality member (ties -> min doc_id) under the formula
    re-derived in Python — gating the window/row_number machinery the
    replay oracle copies verbatim."""
    from tweets_spark_top_10_spark.queries import QUERIES

    ids, texts, edges = _true_jaccard_truth(sf_dir)
    truth = _union_find_components(ids, edges)
    truth_parts = collections.defaultdict(set)
    for i, root in truth.items():
        truth_parts[root].add(i)

    rows = QUERIES["dedup_keep_best_quality"](spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == set(ids)
    got_parts = collections.defaultdict(set)
    canon = {}
    for r in rows:
        got_parts[r.cluster].add(r.doc_id)
        if r.is_canonical:
            assert r.doc_id == r.canonical_id
            canon[r.cluster] = r.doc_id

    assert {frozenset(v) for v in got_parts.values()} == {
        frozenset(v) for v in truth_parts.values()
    }
    for cid, members in got_parts.items():
        assert cid in canon, f"cluster {cid} has no canonical"
        best = min(
            members, key=lambda d: (-_py_quality(texts[d]), d)
        )
        assert canon[cid] == best, (
            f"cluster {cid}: canonical {canon[cid]} != "
            f"brute-force best {best}"
        )
