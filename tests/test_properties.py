"""Property-based checks (hypothesis): the optimized kernels must equal
their naive, verbatim-reference counterparts on arbitrary inputs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pdfextract_spark.oracle.blocks import _slab_pairs, math_score_exceeds
from pdfextract_spark.oracle.regions import split_ys_by_spacing


def _naive_split_ys(region_y1, w_y, w_ey, keys, weights, same, start_y, end_y,
                    min_dist, o_y=None, o_ey=None):
    """The original 1px row scan (pre-optimization), kept as the property
    oracle for the event-based kernel."""
    n = len(w_y)
    if n == 0:
        return []
    wy = np.asarray(w_y, dtype=np.float64)
    wey = np.asarray(w_ey, dtype=np.float64)
    oy = np.asarray(o_y, dtype=np.float64) if o_y is not None else np.empty(0)
    oey = np.asarray(o_ey, dtype=np.float64) if o_ey is not None else np.empty(0)

    def dominating(idx_iter):
        ws, od, rank = {}, {}, 0
        for i in idx_iter:
            k = keys[i]
            ws[k] = ws.get(k, 0) + int(weights[i])
            if k not in od:
                od[k] = rank
            rank += 1
        if not ws:
            return None
        return max(ws, key=lambda k: (ws[k], -od[k]))

    splits, working, in_working = [], [], set()
    last = -1000.0
    y = float(np.floor(start_y))
    stop = min(float(end_y), float(region_y1))
    while y <= stop:
        row = np.nonzero((wy <= y) & (wey >= y))[0]
        occupied = row.size > 0 or bool(np.any((oy <= y) & (oey >= y)))
        if occupied:
            for i in row:
                if int(i) not in in_working:
                    in_working.add(int(i))
                    working.append(int(i))
            last = y
        elif working and (y - last) >= min_dist:
            under, y2 = None, y
            while y2 < region_y1:
                m2 = np.nonzero((wy <= y2) & (wey >= y2))[0]
                if m2.size:
                    under = m2
                    break
                if bool(np.any((oy <= y2) & (oey >= y2))):
                    break
                y2 += 1.0
            if under is not None:
                od_, ud = dominating(working), dominating(int(i) for i in under)
                if od_ is not None and ud is not None and not same(od_, ud):
                    splits.append(y)
                    working, in_working, last = [], set(), y
        y += 1.0
    return splits


word_strat = st.lists(
    st.tuples(
        st.floats(0, 300, allow_nan=False, width=32),   # y
        st.floats(1, 30, allow_nan=False, width=32),    # height
        st.sampled_from(["A", "B", "C"]),               # style
        st.integers(1, 12),                             # weight
    ),
    min_size=0,
    max_size=25,
)


@settings(max_examples=200, deadline=None)
@given(words=word_strat, min_dist=st.sampled_from([10, 20]),
       obstacles=st.lists(st.tuples(st.floats(0, 300, width=32),
                                    st.floats(1, 40, width=32)), max_size=3))
def test_event_kernel_equals_naive_row_scan(words, min_dist, obstacles):
    w_y = np.array([w[0] for w in words], dtype=np.float32)
    w_ey = np.array([w[0] + w[1] for w in words], dtype=np.float32)
    keys = [w[2] for w in words]
    weights = [w[3] for w in words]
    o_y = np.array([o[0] for o in obstacles], dtype=np.float32)
    o_ey = np.array([o[0] + o[1] for o in obstacles], dtype=np.float32)
    same = lambda a, b: a == b  # noqa: E731
    region_y1 = 340.0
    args = (region_y1, w_y, w_ey, keys, weights, same, 0.0, 340.0, min_dist)
    kw = dict(o_y=o_y, o_ey=o_ey) if obstacles else {}
    assert split_ys_by_spacing(*args, **kw) == _naive_split_ys(*args, **kw)


@settings(max_examples=200, deadline=None)
@given(
    items=st.lists(
        st.tuples(st.floats(0, 100, width=32), st.floats(1, 20, width=32),
                  st.floats(0, 100, width=32)),
        min_size=0, max_size=12,
    ),
    n_words=st.integers(0, 12),
)
def test_slab_pairs_equals_bruteforce(items, n_words):
    """Every (word, word) pair returned must be slab-adjacent with no item
    between; every adjacent word pair in some slab must be returned."""
    n_words = min(n_words, len(items))
    lo = np.array([int(np.floor(i[0])) for i in items], dtype=np.int64)
    hi = np.array([int(np.floor(i[0] + i[1])) for i in items], dtype=np.int64)
    pos = np.array([i[2] for i in items], dtype=np.float64)
    a, b = _slab_pairs(lo, hi, pos, n_words)
    got = set(zip(a.tolist(), b.tolist()))

    expect = set()
    if len(items):
        for slab in range(int(lo.min()), int(hi.max()) + 1):
            members = [i for i in range(len(items)) if lo[i] <= slab <= hi[i]]
            members.sort(key=lambda i: (pos[i], i))
            for x, y in zip(members, members[1:]):
                if x < n_words and y < n_words:
                    expect.add((x, y))
    assert got == expect


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(alphabet="ax1+=<3 ", min_size=0, max_size=6),
                min_size=0, max_size=10))
def test_math_score_matches_direct_computation(texts):
    import unicodedata

    score = sum(
        3 if unicodedata.category(c) == "Sm" else (1 if c.isdigit() else 0)
        for t in texts for c in t
    )
    chars = sum(len(t) for t in texts)
    expected = len(texts) >= 4 and score > chars
    assert math_score_exceeds(texts) == expected


# ------------------------- repeated-hsep combining (GraphicSegmentatorImpl) --

def _naive_combine_hseps(roles, m_x, m_y, m_w, m_h):
    """Verbatim transliteration of combineHorizontalSeparators:182-232:
    HashMap grouping by (int(x)/3, int(w)/3), stable sortByLowerY, distance-50
    chain with bbox union. Property oracle for combine_hsep_stacks."""
    import math

    groups = {}
    for i, r in enumerate(roles):
        if r != "hsep":
            continue
        key = (int(m_x[i]) // 3, int(m_w[i]) // 3)
        groups.setdefault(key, []).append(i)
    out = []
    for key, sep_list in groups.items():
        if len(sep_list) < 2:
            continue
        sep_list = sorted(sep_list, key=lambda i: float(m_y[i]))
        cur = [sep_list[0]]
        i0 = sep_list[0]
        bb = [float(m_x[i0]), float(m_y[i0]),
              float(m_x[i0] + m_w[i0]), float(m_y[i0] + m_h[i0])]

        def dist(a, b):
            d = np.float32(0.0)
            if a[0] > b[2]:
                d += (np.float32(a[0]) - np.float32(b[2])) ** 2
            elif b[0] > a[2]:
                d += (np.float32(b[0]) - np.float32(a[2])) ** 2
            if a[1] > b[3]:
                d += (np.float32(a[1]) - np.float32(b[3])) ** 2
            elif b[1] > a[3]:
                d += (np.float32(b[1]) - np.float32(a[3])) ** 2
            return math.sqrt(float(d))

        for j in sep_list[1:]:
            box = [float(m_x[j]), float(m_y[j]),
                   float(m_x[j] + m_w[j]), float(m_y[j] + m_h[j])]
            if dist(bb, box) > 50.0:
                out.append((cur, tuple(bb)))
                cur, bb = [j], box
            else:
                cur.append(j)
                bb = [min(bb[0], box[0]), min(bb[1], box[1]),
                      max(bb[2], box[2]), max(bb[3], box[3])]
        out.append((cur, tuple(bb)))
    return out


@given(
    st.lists(
        st.tuples(
            st.floats(0, 500, width=32), st.floats(0, 700, width=32),
            st.floats(1, 400, width=32), st.floats(1, 12, width=32),
            st.booleans(),
        ),
        min_size=0, max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_combine_hsep_stacks_matches_verbatim(boxes):
    from pdfextract_spark.oracle.regions import combine_hsep_stacks

    m_x = np.array([b[0] for b in boxes], dtype=np.float32)
    m_y = np.array([b[1] for b in boxes], dtype=np.float32)
    m_w = np.array([b[2] for b in boxes], dtype=np.float32)
    m_h = np.array([b[3] for b in boxes], dtype=np.float32)
    roles = ["hsep" if b[4] else "image" for b in boxes]
    got = combine_hsep_stacks(roles, m_x, m_y, m_w, m_h)
    want = _naive_combine_hseps(roles, m_x, m_y, m_w, m_h)
    norm = lambda runs: sorted((sorted(r), tuple(round(v, 3) for v in bb)) for r, bb in runs)
    assert norm(got) == norm(want)
