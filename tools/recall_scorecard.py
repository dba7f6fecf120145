#!/usr/bin/env python3
"""Near-dup recall/precision scorecard (BASELINE.md Round-11): compare
each deployable (banded / capped / clustered) near-dup gate config
against the EXACT ground truth it approximates, at a given SF.

Usage: recall_scorecard.py <verify_out_dir> <sf_dir>
Needs Verify dumps for: q_neardup_minhash q_neardup_ngram
q_simhash_pairs q_simhash64_pairs q_embdup q_embdup_auto
q_embdup_probe q_semdedup.

Ground truths computed here, independently of the engine:
 - text: exact word-3-gram-shingle Jaccard >= 0.8 over ALL doc pairs,
   NO df cap (integer cross-multiplied compare, no float threshold);
 - embeddings: exact cosine >= 0.4 over all pairs (numpy float64,
   rounded to 4 decimals like the engine/oracle);
 - semdedup: the GLOBAL exact drop set {b : exists a<b, cos(a,b)>=t}
   (the cluster-restricted operator can only miss cross-cluster dups).
"""
import sys
import duckdb
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sc"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")


def pairs_of(name, ca="id_a", cb="id_b"):
    return set(map(tuple, con.sql(
        f"SELECT {ca}, {cb} FROM '{OUT}/{name}/*.parquet'").fetchall()))


def pr(found, gt):
    tp = len(found & gt)
    rec = tp / len(gt) if gt else float("nan")
    prec = tp / len(found) if found else float("nan")
    return rec, prec, tp


# ---- text ground truth: uncapped exact 3-gram shingle Jaccard >= 0.8
gt_text = set(map(tuple, con.sql("""
WITH t AS (SELECT doc_id AS id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> len(x) > 0) AS tk FROM documents),
sh AS (SELECT id, unnest(list_distinct(
         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
              ELSE list_transform(generate_series(1, len(tk) - 2),
                                  i -> array_to_string(tk[i:i+2], ' ')) END))
         AS s FROM t),
sz AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY id),
inter AS (SELECT a.id AS ia, b.id AS ib, CAST(count(*) AS BIGINT) AS ni
          FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2)
SELECT ia, ib FROM inter
JOIN sz x ON ia = x.id JOIN sz y ON ib = y.id
WHERE 5 * ni >= 4 * (x.n + y.n - ni)
""").fetchall()))

rows = []
for q in ["q_neardup_minhash", "q_neardup_ngram"]:
    rec, prec, tp = pr(pairs_of(q), gt_text)
    rows.append((q, "jaccard>=0.8 uncapped", len(gt_text), tp, rec, prec))
for q in ["q_simhash_pairs", "q_simhash64_pairs", "q_simhash_verified"]:
    rec, prec, tp = pr(pairs_of(q), gt_text)
    rows.append((q, "jaccard>=0.8 uncapped", len(gt_text), tp, rec, prec))

# ---- embedding ground truth: exact cosine >= 0.4 over all pairs
emb = con.sql(
    "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
ids = np.array([r[0] for r in emb])
X = np.array([r[1] for r in emb], dtype=np.float64)
Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
S = np.round(Xn @ Xn.T, 4)
iu = np.triu_indices(len(ids), k=1)
hit = S[iu] >= 0.4
gt_emb = set(zip(ids[iu[0][hit]].tolist(), ids[iu[1][hit]].tolist()))
gt_emb = {(min(a, b), max(a, b)) for a, b in gt_emb}

for q in ["q_embdup", "q_embdup_hi", "q_embdup_auto", "q_embdup_probe"]:
    found = {(min(a, b), max(a, b)) for a, b in pairs_of(q)}
    rec, prec, tp = pr(found, gt_emb)
    rows.append((q, "cosine>=0.4 all-pairs", len(gt_emb), tp, rec, prec))

# ---- semdedup: keep-set vs the global exact drop set
dropped_gt = set()
order = np.argsort(ids)
for i, j in zip(*iu):
    if S[i, j] >= 0.4:
        a, b = ids[i], ids[j]
        dropped_gt.add(max(a, b))
for q in ["q_semdedup", "q_semdedup_x"]:
    kept = set(r[0] for r in con.sql(
        f"SELECT id FROM '{OUT}/{q}/*.parquet'").fetchall())
    dropped_eng = set(ids.tolist()) - kept
    tp = len(dropped_eng & dropped_gt)
    rec = tp / len(dropped_gt) if dropped_gt else float("nan")
    prec = tp / len(dropped_eng) if dropped_eng else float("nan")
    rows.append((f"{q} (drops)", "global exact drops", len(dropped_gt),
                 tp, rec, prec))

print(f"| gate config | ground truth | GT size | hits | recall | precision |")
print("|---|---|---|---|---|---|")
for q, gt, n, tp, rec, prec in rows:
    print(f"| {q} | {gt} | {n} | {tp} | {rec:.3f} | {prec:.3f} |")
