"""Property-based tests (hypothesis) for the pure core — invariants the
table-driven tests can't sweep."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ptt_spider_go_ray.functions.parse import (
    canonicalize_url,
    clean_file_name,
    decode_push_rate,
    image_file_names,
    unique_dir_names,
    unique_stable,
)
from ptt_spider_go_ray.state.cuckoo import CuckooFilter, hash64

urls = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="/.:-_"),
    min_size=1,
    max_size=40,
)


@settings(deadline=None)
@given(st.integers(min_value=1, max_value=2**64 - 1))
def test_floor_log2_matches_bit_length(v):
    import numpy as np

    from ptt_spider_go_ray.stages.sketch import _floor_log2_u64

    got = _floor_log2_u64(np.array([v], dtype=np.uint64))[0]
    assert got == v.bit_length() - 1


@settings(deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=8, max_size=64),
    st.integers(min_value=0, max_value=7),
)
def test_band_key_matrix_consistency(sig_vals, perturb_band):
    """Identical band rows ⇒ identical keys; perturbing one band changes
    only that band's key (and cross-band key spaces stay disjoint for the
    same content)."""
    import numpy as np

    from ptt_spider_go_ray.stages.dedup import band_key_matrix

    n_bands = 8
    r = max(1, len(sig_vals) // n_bands)
    sig = np.array(sig_vals[: n_bands * r], dtype=np.uint64).reshape(1, -1)
    keys1 = band_key_matrix(np.vstack([sig, sig]), n_bands)
    assert (keys1[0] == keys1[1]).all()
    sig2 = sig.copy()
    sig2[0, perturb_band * r] ^= np.uint64(1)
    keys2 = band_key_matrix(np.vstack([sig, sig2]), n_bands)
    same = keys2[0] == keys2[1]
    assert not same[perturb_band]
    mask = np.ones(n_bands, dtype=bool)
    mask[perturb_band] = False
    assert same[mask].all()


@settings(deadline=None)
@given(st.text(alphabet="ab ", max_size=60), st.text(alphabet="ab ", max_size=60))
def test_hashed_set_jaccard_equals_exact(a, b):
    """Jaccard over 64-bit-hashed shingle sets == Jaccard over the shingle
    sets themselves (no collisions at this scale)."""
    import numpy as np

    from ptt_spider_go_ray.functions.text import jaccard, word_shingles
    from ptt_spider_go_ray.stages.dedup import _shingle_hashes, hashed_set_jaccard

    ha = np.unique(_shingle_hashes(a, 3))
    hb = np.unique(_shingle_hashes(b, 3))
    got = hashed_set_jaccard(ha, hb)
    # empty-text convention differs: _shingle_hashes maps "" to {0}, so two
    # empty docs compare equal on both paths; skip the one-empty asymmetry
    if a.split() and b.split():
        assert got == jaccard(word_shingles(a, 3), word_shingles(b, 3))


@settings(deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="abc/", min_size=1, max_size=8), st.booleans()),
        max_size=6,
    ),
    st.text(alphabet="abc/", min_size=1, max_size=12),
)
def test_robots_wildcard_free_rules_match_prefix_semantics(rules, path):
    """For rules without '*'/'$' the RFC-9309 matcher must behave exactly
    like the original longest-prefix matcher."""
    from ptt_spider_go_ray.state.robots import RobotsRules

    r = RobotsRules(list(rules))
    expect = True
    for prefix, allow in sorted(rules, key=lambda x: (-len(x[0]), not x[1])):
        if prefix and path.startswith(prefix):
            expect = allow
            break
    assert r.allowed(path) == expect


@given(st.lists(st.text(max_size=20)))
def test_unique_stable_properties(items):
    out = unique_stable(items)
    assert len(out) == len(set(out))               # no dups
    assert set(out) == set(items)                  # same elements
    # first occurrence kept, order preserved
    seen = set()
    expect = [x for x in items if not (x in seen or seen.add(x))]
    assert out == expect


@given(st.lists(urls, max_size=30))
def test_image_file_names_properties(img_urls):
    names = image_file_names(img_urls)
    assert len(names) == len(img_urls)             # 1:1 with input
    assert len(names) == len(set(names))           # all distinct


@given(st.text(max_size=60))
def test_clean_file_name_strips_all_invalid(name):
    cleaned = clean_file_name(name)
    assert not any(c in cleaned for c in '\\/:*?"<>|')
    assert clean_file_name(cleaned) == cleaned     # idempotent


@given(st.text(max_size=20))
def test_decode_push_rate_total(s):
    r = decode_push_rate(s)
    assert isinstance(r, int)
    assert -10**18 < r < 10**18                    # never raises, bounded-ish


@given(urls)
def test_canonicalize_idempotent(u):
    c = canonicalize_url("https://example.com/" + u)
    assert canonicalize_url(c) == c


@given(st.lists(st.tuples(st.sampled_from(["A_1", "B_2", "C_3"]), st.sampled_from(["u1", "u2", "u3", "u4"]))))
def test_unique_dir_names_properties(rows):
    out = unique_dir_names(rows)
    assert len(out) == len(rows)
    # same (name,url) pair always resolves to the same dir; distinct urls
    # under one base name get distinct dirs
    resolved = {}
    for (name, url), dir_ in zip(rows, out):
        key = (name, url)
        assert resolved.setdefault(key, dir_) == dir_
    by_base: dict[str, dict[str, str]] = {}
    for (name, url), dir_ in zip(rows, out):
        owners = by_base.setdefault(name, {})
        owners.setdefault(dir_, url)
        assert owners[dir_] == url                 # a dir has exactly one owner


@settings(max_examples=25)
@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=300, unique=True))
def test_cuckoo_no_false_negatives(keys):
    f = CuckooFilter(capacity=4096)
    for k in keys:
        assert f.add_hash(hash64(k))
    for k in keys:
        assert f.contains_hash(hash64(k))          # membership never lost


@given(st.text(max_size=300))
def test_robots_parse_never_raises(text):
    from ptt_spider_go_ray.state.robots import RobotsRules

    r = RobotsRules.parse(text)
    assert isinstance(r.allowed("/any/path"), bool)


@given(st.lists(st.text(min_size=1, max_size=12), max_size=200),
       st.lists(st.text(min_size=1, max_size=12), max_size=200))
@settings(max_examples=20, deadline=None)
def test_hll_merge_commutative(xs, ys):
    from ptt_spider_go_ray.stages.sketch import HLL

    a1, b1 = HLL(p=8), HLL(p=8)
    if xs:
        a1.add_many(xs)
    if ys:
        b1.add_many(ys)
    a2, b2 = HLL(p=8), HLL(p=8)
    if xs:
        a2.add_many(xs)
    if ys:
        b2.add_many(ys)
    assert a1.merge(b1).estimate() == b2.merge(a2).estimate()


@settings(deadline=None)
@given(st.integers(min_value=1, max_value=200))
def test_ntile_fill_formula_matches_reference(n):
    """perplexity_buckets' integer ntile formula == the spec fill rule
    (first n%B buckets take one extra row), for every n."""
    import numpy as np

    B = 3
    q, rem = divmod(n, B)
    head = (q + 1) * rem
    r = np.arange(n, dtype=np.int64)
    got = np.where(r < head, r // max(q + 1, 1), rem + (r - head) // max(q, 1)) + 1
    # reference: explicit bucket sizes
    sizes = [q + 1] * rem + [q] * (B - rem)
    want = [b + 1 for b, s in enumerate(sizes) for _ in range(s)]
    assert got.tolist() == want


@settings(deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_popcount32_matches_bin_count(v):
    import numpy as np

    from ptt_spider_go_ray.queries import _popcount32

    assert _popcount32(np.array([v], dtype=np.uint64))[0] == bin(v).count("1")


@settings(deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc012", min_size=1, max_size=5),
        min_size=3,
        max_size=30,
    )
)
def test_boundary_ends_are_first_and_last_shingle(tokens):
    """boundary_dups' head/tail extraction == the plain-Python first/last
    3-token window fold over the same token stream."""
    import numpy as np
    import pandas as pd

    from ptt_spider_go_ray.queries import _MH_BASE, _MH_MOD, _mh_shingle_batch

    df = pd.DataFrame({"doc_id": [7], "text": [" ".join(tokens)]})
    r = _mh_shingle_batch(df)
    assert r is not None
    _ids, sdoc, sfp = r

    def fold(tok: str) -> int:
        acc = 0
        for ch in tok:
            acc = (acc * _MH_BASE + ord(ch)) % _MH_MOD
        return acc

    def sh(a, b, c):
        return ((fold(a) * _MH_BASE + fold(b)) % _MH_MOD * _MH_BASE + fold(c)) % _MH_MOD

    assert int(sfp[0]) == sh(*tokens[:3])
    assert int(sfp[-1]) == sh(*tokens[-3:])


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 20), w=st.integers(1, 20),
    ch=st.sampled_from([1, 3, 4]), seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, seed):
    """encode→decode is the identity for every supported shape."""
    import numpy as np

    from ptt_spider_go_ray.functions.png import decode_png, encode_png

    shape = (h, w) if ch == 1 else (h, w, ch)
    px = np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(px))
    assert out.shape == px.shape and (out == px).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 2000), rate=st.sampled_from([8000, 16000, 44100]),
    stereo=st.booleans(), seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, stereo, seed):
    """encode→decode preserves sample count, rate, and (mono) sample values
    to the 1/32768 quantization exactly."""
    import numpy as np

    from ptt_spider_go_ray.functions.wav import decode_wav, encode_wav

    s = np.random.default_rng(seed).integers(-32768, 32768, size=n).astype(np.int16)
    data = np.stack([s, s], axis=1) if stereo else s
    got_rate, x = decode_wav(encode_wav(data, rate))
    assert got_rate == rate and len(x) == n
    assert np.allclose(x * 32768.0, s.astype(np.float64))


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 12), h=st.integers(1, 16), w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_roundtrip_property(n, h, w, seed):
    import numpy as np

    from ptt_spider_go_ray.functions.y4m import decode_y4m, encode_y4m

    frames = np.random.default_rng(seed).integers(
        0, 256, size=(n, h, w), dtype=np.uint8
    )
    num, den, out = decode_y4m(encode_y4m(frames, (24, 1)))
    assert (num, den) == (24, 1)
    assert out.shape == frames.shape and (out == frames).all()


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), kind=st.sampled_from(["png", "wav", "y4m"]))
def test_codec_fuzz_fails_only_with_valueerror(seed, kind):
    """Garbage, truncations, and bit-flips of valid files must either decode
    or raise ValueError — never leak struct.error / RuntimeError / EOFError
    from stdlib internals (each leak here was found by fuzzing and fixed)."""
    import numpy as np

    from ptt_spider_go_ray.functions.png import decode_png, encode_png
    from ptt_spider_go_ray.functions.wav import decode_wav, encode_wav
    from ptt_spider_go_ray.functions.y4m import decode_y4m, encode_y4m

    rng = np.random.default_rng(seed)
    enc, dec = {
        "png": (lambda: encode_png(
            rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)), decode_png),
        "wav": (lambda: encode_wav(
            rng.integers(-500, 500, size=40).astype(np.int16)), decode_wav),
        "y4m": (lambda: encode_y4m(
            rng.integers(0, 256, size=(2, 3, 4), dtype=np.uint8)), decode_y4m),
    }[kind]
    v = enc()
    cases = [bytes(rng.integers(0, 256, size=60, dtype=np.uint8)),
             v[: int(rng.integers(0, len(v)))]]
    b = bytearray(v)
    b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
    cases.append(bytes(b))
    for c in cases:
        try:
            dec(c)
        except ValueError:
            pass
