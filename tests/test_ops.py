"""Training-data operator tests: dedup semantics, ANN recall, multimodal
plumbing (SURVEY.md build-out beyond the reference's operator set)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    rows = []
    for i in range(60):
        base = f"alpha beta gamma delta epsilon zeta doc{i % 20}"
        rows.append({"doc_id": i, "text": base})
    # rows 40..59 duplicate 0..19 exactly (doc{i%20} repeats)
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_exact_dedup(docs_ds):
    out = dedup.exact_dedup(docs_ds).to_pandas()
    assert len(out) == 20  # 20 distinct contents
    assert (out["n_dups"] == 3).all()  # i, i+20, i+40
    assert sorted(out["keep_doc_id"]) == list(range(20))


def test_exact_dedup_mixer_matches_sha_groups(docs_ds):
    """Mixer mode must produce the same keep/count structure as sha (hash
    VALUES differ; groups must not)."""
    sha = dedup.exact_dedup(docs_ds, hash_mode="sha").to_pandas()
    mix = dedup.exact_dedup(docs_ds, hash_mode="mixer").to_pandas()
    assert len(mix) == len(sha) == 20
    assert sorted(mix["keep_doc_id"]) == sorted(sha["keep_doc_id"])
    assert sorted(mix["n_dups"]) == sorted(sha["n_dups"])
    apply_sha = dedup.exact_dedup_apply(docs_ds).to_pandas()
    apply_mix = dedup.exact_dedup_apply(docs_ds, hash_mode="mixer").to_pandas()
    assert sorted(apply_mix["doc_id"]) == sorted(apply_sha["doc_id"])


def test_jaccard_salted_skewed_key(ray_session):
    """One shingle shared by EVERY doc (the hot-key fixture): forcing a low
    salt threshold must leave the pair set identical to the unsalted join."""
    rows = []
    for i in range(40):
        # "common common common" shingle in every doc + a distinct tail
        rows.append({"doc_id": i,
                     "text": "common common common common "
                             f"tail{i} tail{i} tail{i} end{i % 4}"})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    base = dedup.ngram_jaccard_pairs(
        ds, threshold=0.05, salt_threshold=10**9).to_pandas()
    salted = dedup.ngram_jaccard_pairs(
        ds, threshold=0.05, salt_threshold=2, n_salts=4).to_pandas()
    key = lambda df: sorted(map(tuple, df[["doc_a", "doc_b", "jaccard"]]
                                .itertuples(index=False)))
    assert key(salted) == key(base)
    assert len(base) > 0


def test_minhash_pairs_find_duplicates(docs_ds):
    pairs = dedup.minhash_lsh_pairs(docs_ds).to_pandas()
    got = {tuple(r) for r in pairs[["doc_a", "doc_b"]].itertuples(index=False)}
    # exact duplicates always collide in every band
    for i in range(20):
        assert (i, i + 20) in got and (i, i + 40) in got and (i + 20, i + 40) in got


def test_simhash_identical_and_different(docs_ds):
    out = dedup.simhash63(docs_ds).to_pandas().set_index("doc_id")["simhash"]
    for i in range(20):
        assert out[i] == out[i + 20] == out[i + 40]
    assert out[0] != out[1]


def test_jaccard_exact_pairs(docs_ds):
    out = dedup.ngram_jaccard_pairs(docs_ds, threshold=0.99).to_pandas()
    got = {tuple(r) for r in out[["doc_a", "doc_b"]].itertuples(index=False)}
    assert got == {(i, j) for i in range(60) for j in range(i + 1, 60)
                   if i % 20 == j % 20}
    assert (out["jaccard"] == 1.0).all()


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    rng = np.random.default_rng(3)
    # 8 well-separated cluster centers + noise -> IVF-friendly geometry
    centers = rng.normal(size=(8, 32)) * 10
    rows = []
    for i in range(400):
        v = centers[i % 8] + rng.normal(size=32)
        rows.append({"vec_id": i, "embedding": v.astype(np.float32).tolist()})
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)


def test_brute_force_topk_exact(emb_ds):
    tbl = emb_ds.to_pandas()
    mat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    qids = np.array([0, 1, 2])
    res = similarity.brute_force_topk(emb_ds, qids, mat[:3], k=5, concurrency=2)
    df = res.to_pandas()
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qi in qids:
        sims = norm[qi] @ norm.T
        sims[qi] = -2
        want = np.lexsort((np.arange(len(sims)), -sims))[:5]
        got = df[df.query_vec_id == qi].sort_values("rank")["vec_id"].to_numpy()
        assert (got == want).all()


def test_range_search_exact(emb_ds):
    """Range search returns exactly the pairs with cosine >= tau (no
    self-matches), independent of partitioning."""
    tbl = emb_ds.to_pandas()
    mat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    qids = np.array([0, 1, 2])
    tau = 0.9  # inside a cluster; well off any boundary
    res = similarity.range_search(emb_ds, qids, mat[:3], tau=tau,
                                  concurrency=2).to_pandas()
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qi in qids:
        sims = norm[qi] @ norm.T
        sims[qi] = -2
        want = set(np.flatnonzero(sims >= tau).tolist())
        got = set(res[res.query_vec_id == qi]["vec_id"])
        assert got == want, qi
        assert len(want) > 0  # cluster geometry guarantees neighbours


def test_grouped_topk_exact(ray_session):
    """Grouping search: top-G label groups per query by best cosine, one
    representative each — exact vs a brute-force pass."""
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(6, 16)) * 8
    rows = [{"vec_id": i,
             "embedding": (centers[i % 6] + rng.normal(size=16))
             .astype(np.float32).tolist(),
             "label": i % 6} for i in range(120)]
    tbl = pa.Table.from_pylist(rows)
    ds = rd.from_arrow(tbl).repartition(5)
    mat = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qids = np.array([0, 1])
    out = similarity.grouped_topk(ds, qids, mat[:2], n_groups=3,
                                  concurrency=2).to_pandas()
    labels = np.array([r["label"] for r in rows])
    for qi in qids:
        sims = norm[qi] @ norm.T
        sims[qi] = -2
        best = {}
        for lb in range(6):
            m = np.flatnonzero(labels == lb)
            j = m[np.lexsort((m, -sims[m]))[0]]
            best[lb] = (sims[j], j)
        want = sorted(best, key=lambda lb: (-best[lb][0], lb))[:3]
        got = out[out.query_vec_id == qi].sort_values("grank")
        assert got["label"].tolist() == want, qi
        assert got["vec_id"].tolist() == [best[lb][1] for lb in want], qi


def test_ivf_recall(emb_ds):
    tbl = emb_ds.to_pandas()
    mat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    qids = np.arange(6)
    brute = similarity.brute_force_topk(emb_ds, qids, mat[:6], k=10,
                                        concurrency=2).to_pandas()
    ivf = similarity.ivf_topk(emb_ds, qids, mat[:6], n_clusters=8, nprobe=2,
                              k=10, concurrency=2).to_pandas()
    recalls = []
    for qi in qids:
        want = set(brute[brute.query_vec_id == qi]["vec_id"])
        got = set(ivf[ivf.query_vec_id == qi]["vec_id"])
        recalls.append(len(want & got) / len(want))
    assert np.mean(recalls) >= 0.9  # clustered geometry: nprobe=2 of 8 is ample


def test_repetition_stats(ray_session):
    ds = rd.from_arrow(pa.Table.from_pylist([
        # 4 tokens, bigrams: "a b","b a","a b" -> 1 - 2/3 dup; top tok 2/4
        {"doc_id": 0, "text": "a b a b"},
        {"doc_id": 1, "text": "x y z"},      # all bigrams distinct
        {"doc_id": 2, "text": "w"},          # <2 tokens -> dup_frac 0
        {"doc_id": 3, "text": ""},           # empty -> both 0
    ]))
    out = textstats.make_op(textstats.repetition_stats_batch)(ds).to_pandas()
    out = out.set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 4
    assert abs(out.loc[0, "dup_bigram_frac"] - (1 - 2 / 3)) < 1e-9
    assert abs(out.loc[0, "top_token_frac"] - 0.5) < 1e-9
    assert out.loc[1, "dup_bigram_frac"] == 0.0
    assert abs(out.loc[1, "top_token_frac"] - 1 / 3) < 1e-9
    assert out.loc[2, "dup_bigram_frac"] == 0.0
    assert out.loc[2, "top_token_frac"] == 1.0
    assert out.loc[3, "n_tokens"] == 0
    assert out.loc[3, "top_token_frac"] == 0.0


def test_gopher_filter_precedence(ray_session):
    long_ok = " ".join(f"w{i}" for i in range(40))       # 40 distinct tokens
    repetitive = "a b " * 20                              # dup bigrams, also top-heavy
    ds = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": 0, "text": long_ok},
        {"doc_id": 1, "text": "x y z"},                   # too_short wins
        {"doc_id": 2, "text": repetitive.strip()},        # repetitive > dominant
    ]))
    out = textstats.make_op(textstats.gopher_filter_batch)(ds).to_pandas()
    out = out.set_index("doc_id")
    assert bool(out.loc[0, "keep"]) and out.loc[0, "reason"] == "ok"
    assert out.loc[1, "reason"] == "too_short" and not bool(out.loc[1, "keep"])
    # doc 2 fails BOTH bigram and top-token rules; precedence picks bigrams
    assert out.loc[2, "reason"] == "repetitive_bigrams"


def test_unigram_nll(ray_session):
    import math

    ds = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": 0, "text": "a a b"},
        {"doc_id": 1, "text": "b"},
        {"doc_id": 2, "text": ""},
    ]))
    out = textstats.unigram_nll(ds, concurrency=1).to_pandas()
    out = out.set_index("doc_id")
    # corpus counts: a=2, b=2, N=4 -> every token nll = ln(2)
    assert abs(out.loc[0, "mean_nll"] - math.log(2)) < 1e-6
    assert abs(out.loc[1, "mean_nll"] - math.log(2)) < 1e-6
    assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "mean_nll"] == 0.0


def test_unigram_nll_sample_lm_oov(ray_session):
    """LM estimated on a sample; OOV terms score ln(N) (prob 1/N)."""
    import math

    lm = rd.from_arrow(pa.Table.from_pylist(
        [{"doc_id": 0, "text": "a a b c"}]))      # N=4: a=2, b=1, c=1
    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"doc_id": 7, "text": "a zzz"}]))        # zzz is OOV
    out = textstats.unigram_nll(ds, lm_ds=lm, concurrency=1).to_pandas()
    want = (-math.log(2 / 4) + math.log(4)) / 2
    assert abs(out.loc[0, "mean_nll"] - want) < 1e-6


def test_langid_markers(ray_session):
    ds = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": 0, "text": "the cat and the dog is in a house"},
        {"doc_id": 1, "text": "el perro y la casa que es una"},
        {"doc_id": 2, "text": "xyz qrs tuv"},  # no markers -> tie -> 'de'
    ]))
    out = textstats.make_op(textstats.langid_batch)(ds).to_pandas()
    out = out.set_index("doc_id")
    assert out.loc[0, "pred_lang"] == "en"
    assert out.loc[1, "pred_lang"] == "es"
    assert out.loc[2, "pred_lang"] == "de" and out.loc[2, "marker_hits"] == 0


def test_multimodal_pipeline(ray_session):
    media = multimodal.synth_media_table(50, seed=1)
    ds = rd.from_arrow(media).repartition(4)
    feats = multimodal.media_features(ds, decode="fake", concurrency=2).to_pandas()
    assert len(feats) == 50
    assert (feats["n_bytes"] > 12).all()
    assert feats["feature"].map(len).eq(8).all()
    # determinism: same payload -> same feature
    again = multimodal.media_features(rd.from_arrow(media), decode="fake",
                                      concurrency=2).to_pandas()
    a = feats.sort_values("media_id").reset_index(drop=True)
    b = again.sort_values("media_id").reset_index(drop=True)
    assert (a["mean_byte"] == b["mean_byte"]).all()
    assert all(np.array_equal(x, y) for x, y in zip(a["feature"], b["feature"]))


def test_multimodal_strict_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal._decode_payload(b"SRIM" + b"\x00" * 20, "strict")


def test_frame_sampler(ray_session):
    media = multimodal.synth_media_table(10, seed=2)
    ds = rd.from_arrow(media)
    frames = ds.map_batches(
        multimodal.FrameSampler, fn_constructor_kwargs={"stride": 4},
        batch_format="pyarrow", concurrency=2, num_cpus=1,
    ).to_pandas()
    hdr = multimodal.HEADER
    for mid, payload in zip(media["media_id"].to_pylist(),
                            media["payload"].to_pylist()):
        _, w, h = hdr.unpack_from(payload)
        n = len(frames[frames.media_id == mid])
        assert n == (h + 3) // 4


def test_connected_components(ray_session):
    import ray.data as rd

    pairs = rd.from_arrow(pa.Table.from_pylist([
        {"doc_a": 1, "doc_b": 5},
        {"doc_a": 5, "doc_b": 9},   # chain 1-5-9
        {"doc_a": 20, "doc_b": 21},
        {"doc_a": 9, "doc_b": 30},  # extends chain -> {1,5,9,30}
    ]))
    all_ids = rd.from_arrow(pa.table({"doc_id": pa.array([1, 5, 9, 20, 21, 30, 99], type=pa.int64())}))
    out = dedup.connected_components(pairs, all_ids_ds=all_ids).to_pandas()
    got = dict(zip(out.doc_id, out.cluster_id))
    assert got == {1: 1, 5: 1, 9: 1, 30: 1, 20: 20, 21: 20, 99: 99}


@pytest.fixture(scope="module")
def neardup_emb_ds(ray_session):
    """60 base vectors + 20 planted near-duplicates (tiny perturbations)."""
    rng = np.random.default_rng(9)
    rows = []
    base = rng.normal(size=(60, 32))
    for i in range(60):
        rows.append({"vec_id": i, "embedding": base[i].astype(np.float32).tolist()})
    for j in range(20):
        v = base[j] + rng.normal(size=32) * 0.02  # cosine ~0.999 vs base[j]
        rows.append({"vec_id": 100 + j, "embedding": v.astype(np.float32).tolist()})
    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)


def test_lsh_neardup_matches_brute_force(neardup_emb_ds):
    """The LSH-bucketed scale path finds exactly the brute-force pairs on
    planted near-dups (deterministic: seeded planes + fixed data)."""
    brute = similarity.cosine_neardup_pairs(
        neardup_emb_ds, threshold=0.9, concurrency=2
    ).to_pandas()
    lsh = similarity.lsh_neardup_pairs(neardup_emb_ds, threshold=0.9).to_pandas()
    bp = set(zip(brute.vec_a, brute.vec_b))
    lp = set(zip(lsh.vec_a, lsh.vec_b))
    assert len(bp) >= 20  # all planted dups are above threshold
    assert lp == bp
    # cosines agree to the shared 6-dp rounding
    merged = brute.merge(lsh, on=["vec_a", "vec_b"], suffixes=("_b", "_l"))
    assert (merged.cosine_b - merged.cosine_l).abs().max() <= 1e-6


def test_mixer_mode_matches_sha_structure(docs_ds):
    """Mixer-mode (vectorized splitmix64) hashes differ from sha mode, but
    the dedup STRUCTURE must agree: exact-duplicate docs land in identical
    LSH buckets and share identical fingerprint sets in both modes."""
    from splade_ray.ops import textstats

    tbl = docs_ds.to_pandas()
    dup_groups = tbl.groupby("text")["doc_id"].apply(list)
    dup_groups = [v for v in dup_groups if len(v) > 1]
    assert dup_groups, "fixture must contain exact duplicates"
    t = pa.Table.from_pandas(tbl[["doc_id", "text"]])
    for mode in ("sha", "mixer"):
        bands = dedup.minhash_bands_batch(t, hash_mode=mode).to_pandas()
        fps = textstats.fingerprint_batch(t, hash_mode=mode).to_pandas()
        bkey = bands.groupby("doc_id").apply(
            lambda g: frozenset(zip(g["band"], g["band_key"])))
        fkey = fps.groupby("doc_id")["fingerprint"].apply(frozenset)
        for group in dup_groups:
            assert len({bkey[d] for d in group}) == 1, (mode, group)
            assert len({fkey.get(d, frozenset()) for d in group}) == 1


def test_mixer_lsh_pairs_find_duplicates(docs_ds):
    """End-to-end mixer-mode LSH still surfaces the planted duplicates."""
    sha_pairs = dedup.minhash_lsh_pairs(docs_ds).to_pandas()
    mix_pairs = dedup.minhash_lsh_pairs(docs_ds, hash_mode="mixer").to_pandas()
    sp = set(zip(sha_pairs.doc_a, sha_pairs.doc_b))
    mp = set(zip(mix_pairs.doc_a, mix_pairs.doc_b))
    # exact duplicates have identical signatures under ANY hash -> present in both
    tbl = docs_ds.to_pandas()
    dup_pairs = set()
    for _, g in tbl.groupby("text")["doc_id"]:
        ids = sorted(g)
        dup_pairs.update((a, b) for i, a in enumerate(ids) for b in ids[i + 1:])
    assert dup_pairs <= sp and dup_pairs <= mp


def test_media_resize(ray_session):
    from splade_ray.ops import multimodal as mm

    ds = rd.from_arrow(mm.synth_media_table(30, seed=4)).repartition(2)
    out = mm.media_resize(ds, out_w=8, out_h=8).to_pandas()
    assert len(out) == 30
    for payload in out.payload:
        magic, w, h = mm.HEADER.unpack_from(payload)
        assert (magic, w, h) == (mm.MAGIC, 8, 8)
        assert len(payload) == mm.HEADER.size + 64
    # deterministic: same input -> same resized bytes
    out2 = mm.media_resize(ds, out_w=8, out_h=8).to_pandas()
    a = out.sort_values("media_id").payload.tolist()
    b = out2.sort_values("media_id").payload.tolist()
    assert a == b
    # resized features still flow through the downstream feature stage
    feats = mm.media_features(
        rd.from_arrow(pa.Table.from_pandas(out.assign(kind="image"))),
    ).to_pandas()
    assert (feats.width == 8).all() and (feats.height == 8).all()


def test_hll_distinct_terms_accuracy(ray_session):
    """HLL estimate lands within ~8% of the true distinct-term count on a
    2k-term synthetic vocabulary (m=256 -> sigma ~= 1.04/16 ~= 6.5%)."""
    from splade_ray.ops import textstats

    rng = np.random.default_rng(23)
    words = [f"w{i}" for i in range(2000)]
    rows = []
    for i in range(300):
        k = int(rng.integers(5, 40))
        rows.append({
            "doc_id": i,
            "text": " ".join(words[int(j)] for j in rng.integers(0, 2000, k)),
        })
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = textstats.hll_distinct_terms(ds).to_pylist()[0]
    true = len({w for r in rows for w in r["text"].split()})
    assert abs(out["hll_estimate"] - true) / true < 0.12
    # partial-merge invariance: different partitioning, same registers
    out2 = textstats.hll_distinct_terms(
        rd.from_arrow(pa.Table.from_pylist(rows)).repartition(11)
    ).to_pylist()[0]
    assert out == out2


def test_multimodal_vectorized_matches_per_row_reference():
    """The batch-wide buffer-math paths (features / resize / frames) must
    reproduce the naive per-row decode exactly — pixel bytes included."""
    import hashlib

    mm = multimodal
    media = mm.synth_media_table(40, seed=9)
    feats = mm.MediaFeatures(decode="fake", feature_dim=8)(media)
    resized = mm.MediaResize(out_w=5, out_h=7)(media)
    frames = mm.FrameSampler(stride=3)(media)

    f_rows = {r["media_id"]: r for r in feats.to_pylist()}
    r_rows = {r["media_id"]: r for r in resized.to_pylist()}
    fr_rows = {}
    for r in frames.to_pylist():
        fr_rows.setdefault(r["media_id"], {})[r["frame"]] = r["frame_bytes"]

    fy = (np.arange(7) + 0.5) / 7
    fx = (np.arange(5) + 0.5) / 5
    for mid, payload in zip(media["media_id"].to_pylist(),
                            media["payload"].to_pylist()):
        w, h, body = mm._decode_payload(payload, "fake")
        arr = np.frombuffer(body, dtype=np.uint8)
        row = f_rows[mid]
        assert (row["width"], row["height"]) == (w, h)
        assert row["n_bytes"] == len(payload)
        assert row["mean_byte"] == float(arr.mean())
        digest = hashlib.sha256(payload).digest()
        want_feat = (np.frombuffer(digest[:32], dtype=np.uint32)
                     .astype(np.float32) / np.float32(2**32))
        assert np.array_equal(np.asarray(row["feature"], dtype=np.float32),
                              want_feat)

        img = arr.reshape(h, w)
        ys = np.minimum((fy * h).astype(np.int64), h - 1)
        xs = np.minimum((fx * w).astype(np.int64), w - 1)
        want_payload = mm.HEADER.pack(mm.MAGIC, 5, 7) + \
            img[np.ix_(ys, xs)].tobytes()
        assert r_rows[mid]["payload"] == want_payload

        want_frames = {f: body[f * w:(f + 1) * w] for f in range(0, h, 3)}
        assert fr_rows[mid] == want_frames


def test_multimodal_handles_large_binary_columns():
    mm = multimodal
    media = mm.synth_media_table(12, seed=3)
    big = pa.table({
        "media_id": media["media_id"],
        "kind": media["kind"],
        "payload": media["payload"].combine_chunks().cast(pa.large_binary()),
    })
    a = mm.MediaFeatures(decode="fake")(media).to_pylist()
    b = mm.MediaFeatures(decode="fake")(big).to_pylist()
    assert a == b
    ra = mm.MediaResize(out_w=6, out_h=6)(media).to_pylist()
    rb = mm.MediaResize(out_w=6, out_h=6)(big).to_pylist()
    assert ra == rb


def test_multimodal_pil_branch_requires_pil():
    """decode='pil' is the production swap-in behind the same interface:
    absent PIL it must fail fast and loud at actor init / decode."""
    if multimodal._pil_image_module() is None:
        with pytest.raises(NotImplementedError):
            multimodal.MediaFeatures(decode="pil")
        with pytest.raises(NotImplementedError):
            multimodal._decode_payload(b"x", "pil")
    else:  # containers that DO ship PIL run the real-codec parity check
        import io

        Image = multimodal._pil_image_module()
        img = Image.frombytes("L", (6, 4), bytes(range(24)))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        w, h, body = multimodal._decode_payload(buf.getvalue(), "pil")
        assert (w, h) == (6, 4)
        assert body == bytes(range(24))
        feats = multimodal.MediaFeatures(decode="pil")(pa.table({
            "media_id": pa.array([0], type=pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([buf.getvalue()], type=pa.binary()),
        }))
        assert feats["width"].to_pylist() == [6]
        assert feats["height"].to_pylist() == [4]


def test_ann_filtered_restricts_candidates(ray_session):
    """Filtered vector search: every returned candidate carries the filter
    label; results equal brute-force top-k over the qualifying subset, and
    a doc outside the label never appears even when it is the global
    nearest neighbor."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops import similarity

    rng = np.random.default_rng(5)
    n, dim = 120, 8
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    labels = (np.arange(n) % 4).astype(np.int32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array([row.tolist() for row in mat],
                              type=pa.list_(pa.float32())),
        "label": pa.array(labels),
    })
    qids = np.array([0, 1, 2])
    qmat = mat[:3]
    res = similarity.brute_force_topk(
        rd.from_arrow(tbl).repartition(5), qids, qmat, k=5,
        concurrency=2, label_filter=2)
    rows = res.to_pylist()
    assert rows
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qi in qids:
        want_pool = [(i, float(norm[qi] @ norm[i]))
                     for i in range(n) if labels[i] == 2 and i != qi]
        want = sorted(want_pool, key=lambda x: (-round(x[1], 12), x[0]))[:5]
        got_q = [(r["vec_id"], r["cosine"]) for r in rows
                 if r["query_vec_id"] == qi]
        assert [v for v, _ in got_q] == [v for v, _ in want], qi
        assert all(labels[v] == 2 for v, _ in got_q)


def test_decontaminate_matches_bruteforce(ray_session):
    """n-gram decontamination: flagged train docs == brute-force 3-gram
    shingle intersection against the test subset; clean docs absent;
    mixer mode flags the same doc set."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops import dedup

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows = [{"doc_id": i,
             "text": " ".join(rng.choice(words, rng.integers(3, 12)))}
            for i in range(300)]
    tbl = pa.Table.from_pylist(rows)
    got = {r["doc_id"]: r["n_shared"]
           for r in dedup.decontaminate(
               rd.from_arrow(tbl).repartition(7), mod=10).take_all()}
    test_sh = set()
    for r in rows:
        if r["doc_id"] % 10 == 0:
            test_sh.update(dedup.shingles(r["text"]))
    want = {}
    for r in rows:
        if r["doc_id"] % 10 == 0:
            continue
        n = len(set(dedup.shingles(r["text"])) & test_sh)
        if n:
            want[r["doc_id"]] = n
    assert got == want
    assert want  # the overlap actually exists in this corpus
    mix = {r["doc_id"]: r["n_shared"]
           for r in dedup.decontaminate(
               rd.from_arrow(tbl).repartition(3), mod=10,
               hash_mode="mixer").take_all()}
    assert mix == want


def test_weighted_fuse_semantics(ray_session):
    """WeightedRanker semantics: per-(query, leg) min-max norm, weighted
    integer-unit sum, tie-break by doc_id; a single-score leg normalizes
    to 1.0; docs present in only one leg get only that leg's contribution."""
    from splade_ray.ops import fusion

    def leg(rows):
        return rd.from_arrow(pa.Table.from_pylist(
            [{"query_id": q, "rank": r, "doc_id": d, "score": s}
             for q, r, d, s in rows]))

    # q1: leg0 has docs 1(3.0) 2(1.0); leg1 has docs 2(5.0) 3(5.0) (tie ->
    # both norm via max==min -> 1.0).  q2: single doc in leg0 only.
    a = leg([(1, 1, 1, 3.0), (1, 2, 2, 1.0), (2, 1, 9, 2.0)])
    b = leg([(1, 1, 2, 5.0), (1, 2, 3, 5.0)])
    out = fusion.weighted_fuse([a, b], (0.7, 0.3)).to_pandas()
    q1 = out[out.query_id == 1].sort_values("rank")
    # doc1: 0.7*1.0 = 0.7 ; doc2: 0.7*0.0 + 0.3*1.0 = 0.3 ; doc3: 0.3*1.0
    assert list(q1.doc_id) == [1, 2, 3]
    assert np.allclose(list(q1.weighted_score), [0.7, 0.3, 0.3])
    # doc2 vs doc3 tie on 0.3 -> doc_id ascending
    q2 = out[out.query_id == 2]
    assert list(q2.doc_id) == [9]
    # single-score leg -> norm 1.0 -> full weight
    assert np.allclose(list(q2.weighted_score), [0.7])


def test_line_dedup_semantics(ray_session):
    """C4-style line dedup: a long line repeated across docs survives only
    at its minimal (doc_id, line_no); short lines always survive; docs
    reassemble in line order; mixer mode matches sha."""
    boiler = "this is repeated boilerplate text"
    rows = [
        {"doc_id": 2, "text": f"{boiler}\nunique alpha content line\nok"},
        {"doc_id": 1, "text": f"unique beta content line\n{boiler}\nok"},
        {"doc_id": 3, "text": f"{boiler}\nok"},
        {"doc_id": 4, "text": boiler},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out = {r["doc_id"]: r["text_clean"]
           for r in dedup.line_dedup(ds, min_chars=10).take_all()}
    # owner of boiler = (doc 1, line 2); 'ok' (2 chars) always survives
    assert out[1] == f"unique beta content line\n{boiler}\nok"
    assert out[2] == "unique alpha content line\nok"
    assert out[3] == "ok"
    assert 4 not in out  # every line removed -> no row
    mix = {r["doc_id"]: r["text_clean"]
           for r in dedup.line_dedup(ds, min_chars=10,
                                     hash_mode="mixer").take_all()}
    assert mix == out


def test_bigram_nll_matches_hand_computation(ray_session):
    import math

    ds = rd.from_arrow(pa.Table.from_pylist([
        {"doc_id": 0, "text": "a b a"},
        {"doc_id": 1, "text": "a"},
        {"doc_id": 2, "text": ""},
    ]))
    out = textstats.bigram_nll(ds, concurrency=1).to_pandas()
    out = out.set_index("doc_id")
    # uni: a=3, b=1, N=4; bigrams: (a b)=1, (b a)=1
    lb, lu = textstats.BIGRAM_LAM_B, textstats.BIGRAM_LAM_U
    p_ab = lb * 1 / 3 + lu * 1 / 4
    p_ba = lb * 1 / 1 + lu * 3 / 4
    want = (-math.log(p_ab) - math.log(p_ba)) / 2
    assert out.loc[0, "n_bigrams"] == 2
    assert abs(out.loc[0, "mean_nll"] - want) < 1e-6
    assert out.loc[1, "n_bigrams"] == 0 and out.loc[1, "mean_nll"] == 0.0
    assert out.loc[2, "n_bigrams"] == 0 and out.loc[2, "mean_nll"] == 0.0


def test_bigram_nll_sample_lm_oov_backoff(ray_session):
    """LM from a sample missing the scored doc's bigrams/unigrams: the
    bigram leg contributes 0 and an unseen unigram backs off to 1/N —
    never a zero probability, never a crash."""
    import math

    lm = rd.from_arrow(pa.Table.from_pylist([{"doc_id": 9, "text": "a"}]))
    ds = rd.from_arrow(pa.Table.from_pylist([{"doc_id": 0, "text": "a b"}]))
    out = textstats.bigram_nll(ds, lm_ds=lm, concurrency=1).to_pandas()
    # uni LM: a=1, N=1; doc bigram (a b): cb=0, cu1(a)=1 -> big leg 0;
    # cu2(b) OOV -> 1.0 -> p = LAM_U * 1/1
    want = -math.log(textstats.BIGRAM_LAM_U)
    assert out.loc[0, "n_bigrams"] == 1
    assert abs(out.loc[0, "mean_nll"] - want) < 1e-6


def test_bigram_nll_empty_lm_raises(ray_session):
    lm = rd.from_arrow(pa.Table.from_pylist([{"doc_id": 9, "text": "  "}]))
    ds = rd.from_arrow(pa.Table.from_pylist([{"doc_id": 0, "text": "a b"}]))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no tokens"):
        textstats.bigram_nll(ds, lm_ds=lm, concurrency=1)
