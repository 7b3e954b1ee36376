#!/usr/bin/env python3
"""Differential data-distribution fuzz of the oracle gate.

The 308 driver-gated queries are all green on ONE generated testdata
distribution. This harness replays a value-sensitive subset of the
catalog against ADVERSARIAL corpora — skewed hot keys, unicode (CJK,
emoji, combining marks, RTL), empty/whitespace strings, constant
columns, duplicate rows, locale-ish numerals, null dims — generated as
parquet with the production schemas, then runs the SAME Spark-vs-DuckDB
compare (scripts/check.py) the driver uses. Any mismatch is a real
semantics divergence between the engine and the oracle on data the
fixed distribution never exercises.

Corpus 1 ("adversarial"): full subset, no null text (typed codec paths
document non-null text as the ingest contract — nulls are quarantined
upstream by the quality gate).
Corpus 2 ("nullish"): null/empty text and a zero embedding vector, run
against the text/embedding families only (the mm codec family requires
the non-null contract).

Usage: python3 scripts/differential_fuzz.py [--seed 17] [--keep]
Deterministic for a fixed seed. Exit 0 = all replays byte-identical.
"""
import argparse
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
BASE = "/root/testdata/sf0.001"

SUBSET_FULL = [
    # exact/fingerprint + group-min determinism
    "dedup_exact", "text_fingerprint",
    # shingle/LSH thresholds (hash + threshold boundaries on weird tokens)
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_jaccard_prefix",
    # span semantics (gram windows over unicode/hot text)
    "dedup_substring_exact",
    # token pipelines (quality ratios, langid stopword sets, entropy logs)
    "text_quality", "text_tokens", "text_langid", "text_entropy",
    "curation_gopher_rules",
    # multimodal identity + container arithmetic (UTF-8 byte vs char)
    "mm_dedup", "mm_binary_meta", "mm_decode_features",
    # windows + packing (tie order under duplicate sort keys)
    "train_pipeline_e2e", "train_pack_sequences",
    # embeddings (cosine ties on duplicate vectors, quantization ranges)
    "sim_topk_bruteforce", "dedup_embedding_cosine", "emb_quantize",
]
SUBSET_NULLISH = [
    "dedup_exact", "text_quality", "text_tokens", "text_langid",
    "text_entropy", "train_pipeline_e2e", "train_pack_sequences",
    "sim_topk_bruteforce", "dedup_embedding_cosine",
]

UNICODE_TEXTS = [
    "héllo wörld héllo",               # latin accents
    "你好 世界 你好 世界",  # CJK
    "\U0001f600 \U0001f389 \U0001f600 \U0001f600",    # emoji (4-byte UTF-8)
    "éclair éclair café",            # combining accents
    "مرحبا بالعالم",  # RTL
    # Case-fold traps. NOT U+0130 'İ': the first fuzz run found a real,
    # documented platform divergence there — Java/Spark lower() follows
    # Unicode SpecialCasing (İ → 'i' + U+0307 combining dot, LENGTHENING
    # the string), DuckDB's utf8proc simple-folds İ → 'i', so regex
    # tokenization over lower(text) legitimately differs (bpeish count
    # 9 vs 7 on "ßß İstanbul ışık"). Pinned in TextAnalysisSpec
    # ("U+0130 case-mapping is the oracle-replication boundary"); ß and
    # dotless ı agree between engines and stay in the corpus.
    "ßß STRASSE istanbul-free ışık",
    "ЯЗЫК Русский язык",  # Cyrillic case pairs (simple fold, engines agree)
]


def lcg(seed):
    s = seed & 0x7FFFFFFF

    def nxt(n):
        nonlocal s
        s = (1103515245 * s + 12345) & 0x7FFFFFFF
        return s % n
    return nxt


def gen_documents(seed, nullish):
    rnd = lcg(seed)
    hot = "the quick brown fox jumps over the lazy dog again and again"
    vocab = ["alpha", "beta", "gamma", "delta", "42", "3.14", "x1", "-7"]
    rows = []
    nid = 1

    def add(text, lang="en", source=None):
        nonlocal nid
        rows.append({
            "doc_id": nid,
            "text": text,
            "lang": lang,
            "source": source if source is not None else f"src{nid % 3}",
            "n_chars": len(text) if text is not None else 0,
        })
        nid += 1

    # 50% hot-key skew: the same text (and its near-dups) dominates
    for i in range(60):
        add(hot)
    for i in range(12):
        add(hot.replace("fox", f"fox{i}"))
    # unicode block (each twice: exact duplicates with non-ASCII bytes)
    for t in UNICODE_TEXTS:
        add(t)
        add(t)
    # whitespace pathologies
    add("")
    add(" ")
    add("   ")
    add("\t\t")
    add("a")
    add("word")
    add("two words")
    add("trailing space ")
    add(" leading space")
    add("internal  double  spaces")
    # locale-ish numerals and punctuation storms
    add("1.234,56 7.890,12 1.234,56")
    add("!!! ??? ... ,,, ;;; :::")
    add("100% #1 @user $5.00 €3,50")
    # single-token spam (repetition detectors, entropy ~0)
    add(("spam " * 200).strip())
    # a very long doc (window/packing boundaries)
    long_toks = [vocab[rnd(len(vocab))] for _ in range(2000)]
    add(" ".join(long_toks))
    # constant-column stretch: same lang/source for a while
    for i in range(30):
        toks = [vocab[rnd(len(vocab))] for _ in range(4 + rnd(8))]
        add(" ".join(toks), lang="zz", source="konst")
    # random small docs with null lang/source sprinkled in
    for i in range(60):
        toks = [vocab[rnd(len(vocab))] for _ in range(1 + rnd(10))]
        lang = None if rnd(7) == 0 else ["en", "de", "fr"][rnd(3)]
        source = None if rnd(7) == 0 else f"src{rnd(5)}"
        add(" ".join(toks), lang=lang, source=source)
    if nullish:
        for i in range(10):
            add(None, lang=None, source=None)
        add("")
        add(None)
    schema = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
        ("source", pa.string()), ("n_chars", pa.int64())])
    return pa.Table.from_pylist(rows, schema=schema)


def gen_embeddings(seed, nullish):
    rnd = lcg(seed + 1)
    rows = []

    def vec(f):
        return [float(f(i)) for i in range(64)]
    vid = 0

    def add(v, label=0):
        nonlocal vid
        rows.append({"vec_id": vid, "embedding": v, "label": label})
        vid += 1

    # duplicate vectors -> exact cosine ties (tie-break order must match)
    dup = vec(lambda i: (i % 5) - 2 or 1)
    for _ in range(8):
        add(dup, label=1)
    # constant vector, sign patterns, tiny/huge magnitudes
    add(vec(lambda i: 3))
    add(vec(lambda i: -3))
    add(vec(lambda i: 1 if i % 2 == 0 else -1))
    add(vec(lambda i: 1e-30 if i == 0 else 0), label=2)
    add(vec(lambda i: 1e20 if i < 2 else -1e20), label=2)
    if nullish:
        add(vec(lambda i: 0), label=3)  # zero vector: norm 0
    # random grid vectors with repeats
    for k in range(180):
        base = rnd(9)
        add([float((rnd(7) - 3) or (base % 3 + 1)) for _ in range(64)],
            label=rnd(4))
    schema = pa.schema([
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32())])
    return pa.Table.from_pylist(rows, schema=schema)


def materialize(dirpath, seed, nullish):
    os.makedirs(dirpath, exist_ok=True)
    for t in os.listdir(BASE):
        if t not in ("documents.parquet", "embeddings.parquet"):
            dst = os.path.join(dirpath, t)
            if not os.path.exists(dst):
                shutil.copy(os.path.join(BASE, t), dst)
    pq.write_table(gen_documents(seed, nullish),
                   os.path.join(dirpath, "documents.parquet"))
    pq.write_table(gen_embeddings(seed, nullish),
                   os.path.join(dirpath, "embeddings.parquet"))


def run_pass(name, dirpath, outdir, queries):
    print(f"== differential pass: {name} ({len(queries)} queries) ==",
          flush=True)
    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {dirpath} {outdir} {','.join(queries)}"],
        cwd=REPO, capture_output=True, text=True)
    # sbt folds the forked JVM's stderr into its own stdout log
    fails = [l for l in (r.stdout + r.stderr).splitlines()
             if "[verify]" in l and "failed:" in l]
    for l in fails:
        print("  SPARK-SIDE FAILURE:", l, flush=True)
    chk = subprocess.run(
        [sys.executable, os.path.join(HERE, "check.py"), outdir, dirpath],
        cwd=REPO, capture_output=True, text=True)
    bad = []
    for line in chk.stdout.splitlines():
        qname = line.split(":")[0].split()[-1] if ":" in line else ""
        if qname not in queries:
            continue  # check.py reports the whole catalog; ignore unran rows
        print(" ", line, flush=True)
        if not line.startswith("OK"):
            bad.append(line)
    return fails + bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--keep", action="store_true",
                    help="keep the generated corpora on disk")
    args = ap.parse_args()
    root = f"/tmp/graft_diff_fuzz_{args.seed}"
    if os.path.exists(root):
        shutil.rmtree(root)
    adv = os.path.join(root, "adversarial")
    nul = os.path.join(root, "nullish")
    materialize(adv, args.seed, nullish=False)
    materialize(nul, args.seed + 1000, nullish=True)
    bad = run_pass("adversarial", adv, os.path.join(root, "out_adv"),
                   SUBSET_FULL)
    bad += run_pass("nullish", nul, os.path.join(root, "out_nul"),
                    SUBSET_NULLISH)
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    if bad:
        print(f"DIFFERENTIAL MISMATCHES: {len(bad)}")
        sys.exit(1)
    print("differential fuzz: all replays byte-identical")


if __name__ == "__main__":
    main()
