"""Pin the expected `media_phash_pairs` result as a parquet fixture.

INDEPENDENT oracle implementation: plain numpy, straight from the pHash
definition (32x32 gray -> orthonormal 2-D DCT-II -> low-frequency 8x8
block, DC dropped -> median threshold -> 63 bits), then a brute-force
O(n^2) hamming scan — deliberately NOT the engine's pigeonhole-blocked
join, so the fixture cross-checks both the hash math and the blocking.

One row group per scale factor, tagged with `tag` = sum(length(text))
over the query's doc_id<200 input slice (a content-derived key — row
count alone collides between sf0.001 and sf0.01) so a single static
oracle SQL string selects the right slice at whatever SF the driver runs:

    SELECT id_a, id_b, hamming
    FROM '/root/repo/tests/fixtures/media_phash_pairs.parquet'
    WHERE tag = (SELECT sum(length(text)) FROM documents
                 WHERE doc_id < 200)

Regenerate after any change to the contract query's inputs:
    python tools/make_phash_fixture.py
"""

import itertools

import duckdb
import numpy as np
import pandas as pd

SFS = ["sf0.001", "sf0.01", "sf0.1"]
OUT = "/root/repo/tests/fixtures/media_phash_pairs.parquet"
MAX_HAMMING = 2


def dct_matrix(n):
    k = np.arange(n).reshape(-1, 1)
    i = np.arange(n).reshape(1, -1)
    m = np.cos(np.pi * k * (2 * i + 1) / (2 * n))
    m[0] /= np.sqrt(2)
    return m * np.sqrt(2.0 / n)


D = dct_matrix(32)


def phash(content: bytes) -> int:
    b = np.frombuffer(content, dtype=np.uint8)
    if b.size == 0:
        b = np.zeros(1, dtype=np.uint8)
    reps = -(-1024 // b.size)
    g = np.tile(b, reps)[:1024].astype(np.float64).reshape(32, 32)
    d = (D @ g @ D.T)[:8, :8].flatten()[1:]
    bits = d > np.median(d)
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v


def pairs_for(sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' "
        "WHERE doc_id < 200 ORDER BY doc_id").fetchdf()
    tag = con.sql(
        f"SELECT sum(length(text)) FROM '{sf_dir}/documents.parquet' "
        "WHERE doc_id < 200").fetchone()[0]
    ids, hashes = [], []
    for _, r in docs.iterrows():
        content = str(r["text"]).encode("utf-8")
        h = phash(content)
        ids.extend([int(r["doc_id"]), int(r["doc_id"]) + 100000])
        hashes.extend([h, h])  # copies share the payload byte-for-byte
    rows = []
    for (ia, ha), (ib, hb) in itertools.combinations(zip(ids, hashes), 2):
        d = bin(ha ^ hb).count("1")
        if d <= MAX_HAMMING:
            a, b = (ia, ib) if ia < ib else (ib, ia)
            rows.append((tag, a, b, d))
    out = pd.DataFrame(rows, columns=["tag", "id_a", "id_b", "hamming"])
    return out.drop_duplicates(["id_a", "id_b"]).sort_values(
        ["id_a", "id_b"]).reset_index(drop=True)


def main():
    frames = [pairs_for(f"/root/testdata/{sf}") for sf in SFS]
    all_pairs = pd.concat(frames, ignore_index=True)
    all_pairs = all_pairs.astype({"tag": "int64", "id_a": "int64",
                                  "id_b": "int64", "hamming": "int64"})
    all_pairs.to_parquet(OUT, index=False)
    for sf, f in zip(SFS, frames):
        print(f"{sf}: {len(f)} pairs (tag {f['tag'].iloc[0] if len(f) else '-'})")
    print(f"wrote {OUT} ({len(all_pairs)} rows)")


if __name__ == "__main__":
    main()
