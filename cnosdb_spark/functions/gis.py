"""GIS scalar functions over WKT strings.

Reference: /root/reference query_server/query/src/extension/expr/
scalar_function/gis/ — st_geomfromwkb/st_asbinary/st_distance/st_area and
binary predicates (st_intersects, st_contains, st_within, st_equals,
st_disjoint) over WKT-typed geometry columns
(tests: query_server/sqllogicaltests/cases/function/gis/*.slt).

No shapely in this container → a small pure-numpy WKT engine inside
Arrow-batched pandas UDFs: POINT / LINESTRING / POLYGON parsing, euclidean
distance (point-point exact; other pairs via vertex sampling like the
reference's geo crate does for non-point geometries), shoelace area,
ray-cast point-in-polygon. Enough to cover the reference's test surface.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F, types as T

_COORD_RE = re.compile(r"(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)")


# longest-prefix first so MULTIPOINT doesn't match POINT
_WKT_TYPES = (
    "MULTIPOLYGON", "MULTILINESTRING", "MULTIPOINT",
    "GEOMETRYCOLLECTION", "POINT", "LINESTRING", "POLYGON",
)
_SIMPLE_TYPES = ("POINT", "LINESTRING", "POLYGON")


def _parse(wkt: str):
    """WKT → (type, Nx2 coords). SQL NULL → (None, None); unparseable
    text raises (the reference's geozero parse failure —
    gis/st_area.slt errors on non-WKT strings)."""
    if wkt is None:
        return None, None
    s = wkt.strip().upper()
    for t in _WKT_TYPES:
        if s.startswith(t):
            rest = s[len(t):].strip()
            if rest != "EMPTY" and not rest.startswith("("):
                break
            coords = np.array(
                [[float(a), float(b)] for a, b in _COORD_RE.findall(s)]
            )
            return t, coords
    raise ValueError(f"invalid WKT geometry: {wkt[:60]!r}")


def _poly_area(coords: np.ndarray) -> float:
    x, y = coords[:, 0], coords[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def _parse_nest(s: str, i: int = 0):
    """Parenthesized WKT body → nested lists; leaves are coordinate text."""
    out: list = []
    while i < len(s):
        c = s[i]
        if c == "(":
            node, i = _parse_nest(s, i + 1)
            out.append(node)
        elif c == ")":
            return out, i + 1
        else:
            j = i
            while j < len(s) and s[j] not in "()":
                j += 1
            txt = s[i:j].strip().strip(",").strip()
            if txt:
                out.append(txt)
            i = j
    return out, i


def _polygon_rings(wkt: str, t: str) -> list[list[np.ndarray]]:
    """POLYGON/MULTIPOLYGON WKT → [polygon][ring] coord arrays (ring 0 is
    the outer shell, later rings are holes)."""
    body = wkt.strip()[len(t):].strip()
    nest, _ = _parse_nest(body)
    if not nest:
        return []

    def ring(leaf) -> np.ndarray:
        txt = leaf[0] if isinstance(leaf, list) else leaf
        return np.array([[float(a), float(b)] for a, b in _COORD_RE.findall(txt)])

    node = nest[0]
    if t == "POLYGON":
        return [[ring(r) for r in node]]
    return [[ring(r) for r in poly] for poly in node]


_GC_MEMBER_RE = re.compile(
    r"\b(MULTIPOLYGON|POLYGON|MULTILINESTRING|MULTIPOINT|LINESTRING|POINT)\s*\("
)


def _collection_members(wkt: str) -> list[str]:
    """GEOMETRYCOLLECTION body → member WKT strings (balanced-paren scan)."""
    body = wkt.strip()[len("GEOMETRYCOLLECTION"):]
    members = []
    for m in _GC_MEMBER_RE.finditer(body):
        depth, j = 1, m.end()
        while j < len(body) and depth:
            if body[j] == "(":
                depth += 1
            elif body[j] == ")":
                depth -= 1
            j += 1
        members.append(body[m.start() : j])
    return members


def _area_of(wkt: str) -> float:
    t = next((x for x in _WKT_TYPES if wkt.startswith(x)), None)
    if t in ("POLYGON", "MULTIPOLYGON"):
        total = 0.0
        for rings in _polygon_rings(wkt, t):
            if not rings or len(rings[0]) < 3:
                continue
            total += _poly_area(rings[0]) - sum(
                _poly_area(h) for h in rings[1:] if len(h) >= 3
            )
        return total
    if t == "GEOMETRYCOLLECTION":
        return sum(_area_of(mem) for mem in _collection_members(wkt))
    return 0.0


_EPS = 1e-9


def _orient(a, b, c) -> float:
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _on_seg(p, a, b) -> bool:
    """Point p lies on segment a-b (collinear + within bounding box)."""
    if abs(_orient(a, b, p)) > _EPS * (1 + abs(a[0]) + abs(b[0]) + abs(a[1]) + abs(b[1])):
        return False
    return (
        min(a[0], b[0]) - _EPS <= p[0] <= max(a[0], b[0]) + _EPS
        and min(a[1], b[1]) - _EPS <= p[1] <= max(a[1], b[1]) + _EPS
    )


def _segs(coords: np.ndarray):
    for i in range(len(coords) - 1):
        yield coords[i], coords[i + 1]


def _seg_intersect(p1, p2, p3, p4) -> bool:
    """Segments p1-p2 and p3-p4 intersect (touching counts)."""
    d1, d2 = _orient(p3, p4, p1), _orient(p3, p4, p2)
    d3, d4 = _orient(p1, p2, p3), _orient(p1, p2, p4)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
        return True
    return (
        _on_seg(p1, p3, p4) or _on_seg(p2, p3, p4)
        or _on_seg(p3, p1, p2) or _on_seg(p4, p1, p2)
    )


def _seg_proper_cross(p1, p2, p3, p4) -> bool:
    """Strict transversal crossing (shared boundary / touching excluded)."""
    d1, d2 = _orient(p3, p4, p1), _orient(p3, p4, p2)
    d3, d4 = _orient(p1, p2, p3), _orient(p1, p2, p4)
    return (
        ((d1 > _EPS and d2 < -_EPS) or (d1 < -_EPS and d2 > _EPS))
        and ((d3 > _EPS and d4 < -_EPS) or (d3 < -_EPS and d4 > _EPS))
    )


def _point_on_linestring(pt, coords: np.ndarray) -> bool:
    return any(_on_seg(pt, a, b) for a, b in _segs(coords))


def _point_in_or_on(pt, poly: np.ndarray) -> bool:
    return _point_in_poly(pt, poly) or _point_on_linestring(
        pt, np.vstack([poly, poly[:1]])
    )


def _geom_contains(ta, ca, tb, cb):
    """geo crate Contains semantics for the supported pairs; None for
    unimplemented combinations (matches the reference's partial surface)."""
    if ta == "POLYGON" and len(ca) >= 3:
        if tb == "POINT":
            return bool(_point_in_poly(cb[0], ca)) if len(cb) else False
        if tb in ("LINESTRING", "POLYGON"):
            if not len(cb):
                return False
            ring = np.vstack([ca, ca[:1]])
            if not all(_point_in_or_on(p, ca) for p in cb):
                return False
            # every B vertex is in/on A — only a strict transversal
            # boundary crossing can still put part of B outside
            return not any(
                _seg_proper_cross(b1, b2, a1, a2)
                for b1, b2 in _segs(np.vstack([cb, cb[:1]]) if tb == "POLYGON" else cb)
                for a1, a2 in _segs(ring)
            )
    if ta == "LINESTRING":
        if not len(ca):
            return False  # LINESTRING EMPTY contains nothing
        if tb == "POINT" and len(cb):
            pt = cb[0]
            # the boundary of a linestring is its two endpoints — they are
            # NOT contained (st_contains.slt:40-55)
            if (np.allclose(pt, ca[0]) or np.allclose(pt, ca[-1])):
                return False
            return _point_on_linestring(pt, ca)
    return None


def _norm_line(coords: np.ndarray) -> np.ndarray:
    """Drop repeated and collinear interior vertices (spatial-equality
    canonical form for linestrings)."""
    pts = [coords[0]]
    for p in coords[1:]:
        if not np.allclose(p, pts[-1]):
            pts.append(p)
    out = [pts[0]]
    for i in range(1, len(pts) - 1):
        if abs(_orient(out[-1], pts[i], pts[i + 1])) > _EPS:
            out.append(pts[i])
    if len(pts) > 1:
        out.append(pts[-1])
    return np.array(out)


def _point_in_poly(pt: np.ndarray, poly: np.ndarray) -> bool:
    x, y = pt
    inside = False
    n = len(poly)
    j = n - 1
    for i in range(n):
        xi, yi = poly[i]
        xj, yj = poly[j]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def _min_dist(a: np.ndarray, b: np.ndarray) -> float:
    d = a[:, None, :] - b[None, :, :]
    return float(np.sqrt((d * d).sum(axis=2)).min())


@F.pandas_udf(T.DoubleType())
def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    """Euclidean distance with the geo crate's exact pair matrix:
    simple × simple and POINT × MULTI(POINT|LINESTRING|POLYGON) are
    supported; everything else errors 'is not supported'
    (st_distance.slt pins both the values and the unsupported pairs)."""
    out = []
    for wa, wb in zip(a, b):
        ta, ca = _parse(wa)
        tb, cb = _parse(wb)
        if ta is None or tb is None:
            out.append(None)
            continue
        supported = (ta in _SIMPLE_TYPES and tb in _SIMPLE_TYPES) or (
            {ta, tb} & {"POINT"}
            and {ta, tb} <= {"POINT", "MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON"}
        )
        if not supported:
            raise ValueError(
                f"Calculating the distance between {ta} and {tb} "
                "is not supported"
            )
        if len(ca) == 0 or len(cb) == 0:
            out.append(None)
            continue
        out.append(_geom_distance(ta, wa, ca, tb, wb, cb))
    return pd.Series(out, dtype="float64")


def _pt_seg_dist(p, a, b) -> float:
    ab = (b[0] - a[0], b[1] - a[1])
    ap = (p[0] - a[0], p[1] - a[1])
    denom = ab[0] * ab[0] + ab[1] * ab[1]
    t = 0.0 if denom == 0 else max(0.0, min(1.0, (ap[0] * ab[0] + ap[1] * ab[1]) / denom))
    dx, dy = p[0] - (a[0] + t * ab[0]), p[1] - (a[1] + t * ab[1])
    return float(np.hypot(dx, dy))


def _pt_line_dist(p, coords: np.ndarray) -> float:
    if len(coords) == 1:
        return float(np.hypot(p[0] - coords[0][0], p[1] - coords[0][1]))
    return min(_pt_seg_dist(p, a, b) for a, b in _segs(coords))


def _seg_seg_dist(a1, a2, b1, b2) -> float:
    if _seg_intersect(a1, a2, b1, b2):
        return 0.0
    return min(
        _pt_seg_dist(a1, b1, b2), _pt_seg_dist(a2, b1, b2),
        _pt_seg_dist(b1, a1, a2), _pt_seg_dist(b2, a1, a2),
    )


def _line_line_dist(ca: np.ndarray, cb: np.ndarray) -> float:
    return min(
        _seg_seg_dist(a1, a2, b1, b2)
        for a1, a2 in _segs(ca)
        for b1, b2 in _segs(cb)
    )


def _pt_rings_dist(p, rings: list[np.ndarray]) -> float:
    """Distance from a point to a polygon given its rings: 0 inside the
    outer shell and outside every hole; else distance to the nearest
    ring boundary (a point inside a hole is outside the polygon)."""
    outer = rings[0]
    in_outer = _point_in_poly(p, outer) or _point_on_linestring(
        p, np.vstack([outer, outer[:1]])
    )
    in_hole = any(_point_in_poly(p, h) for h in rings[1:] if len(h) >= 3)
    if in_outer and not in_hole:
        return 0.0
    return min(
        _pt_line_dist(p, np.vstack([r, r[:1]]))
        for r in rings
        if len(r) >= 2
    )


def _geom_distance(ta, wa, ca, tb, wb, cb) -> float:
    if ta != "POINT" and tb == "POINT":
        ta, wa, ca, tb, wb, cb = tb, wb, cb, ta, wa, ca
    if ta == "POINT":
        p = ca[0]
        if tb == "POINT":
            return float(np.hypot(p[0] - cb[0][0], p[1] - cb[0][1]))
        if tb == "LINESTRING":
            return _pt_line_dist(p, cb)
        if tb == "POLYGON":
            return _pt_rings_dist(p, _polygon_rings(wb.strip().upper(), tb)[0])
        if tb == "MULTIPOINT":
            return float(np.min(np.hypot(cb[:, 0] - p[0], cb[:, 1] - p[1])))
        if tb == "MULTILINESTRING":
            body = wb.strip().upper()[len(tb):]
            nest, _ = _parse_nest(body)
            return min(
                _pt_line_dist(p, np.array(_leaf_coords(l))) for l in nest[0]
            )
        if tb == "MULTIPOLYGON":
            return min(
                _pt_rings_dist(p, rings)
                for rings in _polygon_rings(wb.strip().upper(), tb)
            )
    # simple × simple, no point involved
    ra = (
        np.vstack([ca, ca[:1]]) if ta == "POLYGON" else ca
    )
    rb = (
        np.vstack([cb, cb[:1]]) if tb == "POLYGON" else cb
    )
    if ta == "POLYGON" and (
        any(_point_in_or_on(p, ca) for p in cb)
        or (tb == "POLYGON" and any(_point_in_or_on(p, cb) for p in ca))
    ):
        return 0.0
    if tb == "POLYGON" and any(_point_in_or_on(p, cb) for p in ca):
        return 0.0
    return _line_line_dist(ra, rb)


@F.pandas_udf(T.DoubleType())
def st_area(g: pd.Series) -> pd.Series:
    out = []
    for w in g:
        t, c = _parse(w)
        if t is None:
            out.append(None)
        elif t == "POINT" and len(c) == 0:
            # parity quirk: geo errors on empty POINT specifically
            # (st_area.slt "The input was an empty Point")
            raise ValueError(
                "processing geometry `The input was an empty Point, but "
                "the output doesn't support empty Points`"
            )
        elif t in ("POLYGON", "MULTIPOLYGON", "GEOMETRYCOLLECTION"):
            # geo crate unsigned_area semantics: sum over polygons of
            # (outer-shell area − hole areas); collections sum their
            # polygonal members — the flattened-coordinate shoelace is
            # wrong for multipolygons (st_area.slt:159 expects
            # 2750 + 27.5 = 2777.5 for the two-polygon fixture)
            out.append(_area_of(w.strip().upper()))
        else:
            out.append(0.0)
    return pd.Series(out, dtype="float64")


@F.pandas_udf(T.BooleanType())
def st_contains(a: pd.Series, b: pd.Series) -> pd.Series:
    """Contains over the geo crate's supported pairs: polygon ⊇
    point/linestring/polygon (boundary contact allowed, transversal
    boundary crossings excluded) and linestring ∋ point (endpoints are
    the boundary and are NOT contained). Other pairs → None."""
    out = []
    for wa, wb in zip(a, b):
        ta, ca = _parse(wa)
        tb, cb = _parse(wb)
        out.append(None if ta is None or tb is None else _geom_contains(ta, ca, tb, cb))
    return pd.Series(out, dtype="object")


@F.pandas_udf(T.BooleanType())
def st_within(a: pd.Series, b: pd.Series) -> pd.Series:
    """within(A, B) = contains(B, A)."""
    out = []
    for wa, wb in zip(a, b):
        ta, ca = _parse(wa)
        tb, cb = _parse(wb)
        out.append(None if ta is None or tb is None else _geom_contains(tb, cb, ta, ca))
    return pd.Series(out, dtype="object")


@F.pandas_udf(T.BooleanType())
def st_equals(a: pd.Series, b: pd.Series) -> pd.Series:
    """Spatial equality, not coordinate-list equality: linestrings drop
    repeated/collinear interior vertices and match in either direction
    (st_equals.slt: LINESTRING(0 0,10 10) == LINESTRING(0 0,5 5,10 10))."""
    out = []
    for wa, wb in zip(a, b):
        ta, ca = _parse(wa)
        tb, cb = _parse(wb)
        if ta is None or tb is None:
            out.append(None)
        elif ta != tb:
            out.append(False)
        elif ta == "LINESTRING" and len(ca) > 1 and len(cb) > 1:
            na, nb = _norm_line(ca), _norm_line(cb)
            out.append(
                na.shape == nb.shape
                and (bool(np.allclose(na, nb)) or bool(np.allclose(na, nb[::-1])))
            )
        else:
            out.append(ca.shape == cb.shape and bool(np.allclose(ca, cb)))
    return pd.Series(out, dtype="object")


@F.pandas_udf(T.BooleanType())
def st_intersects(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact intersects for point/linestring/polygon pairs (on-segment,
    segment-pair, containment tests); vertex min-distance fallback for
    MULTI*/COLLECTION, like the reference's geo sampling."""
    out = []
    for wa, wb in zip(a, b):
        ta, ca = _parse(wa)
        tb, cb = _parse(wb)
        if ta is None or tb is None or not len(ca) or not len(cb):
            out.append(None)
            continue
        out.append(_geom_intersects(ta, ca, tb, cb))
    return pd.Series(out, dtype="object")


def _geom_intersects(ta, ca, tb, cb) -> bool:
    # normalize order: point < linestring < polygon < other
    rank = {"POINT": 0, "LINESTRING": 1, "POLYGON": 2}
    if rank.get(ta, 3) > rank.get(tb, 3):
        ta, ca, tb, cb = tb, cb, ta, ca
    if ta == "POINT":
        if tb == "POINT":
            return bool(np.allclose(ca[0], cb[0]))
        if tb == "LINESTRING":
            return _point_on_linestring(ca[0], cb)
        if tb == "POLYGON":
            return _point_in_or_on(ca[0], cb)
    if ta == "LINESTRING":
        if tb == "LINESTRING":
            return any(
                _seg_intersect(a1, a2, b1, b2)
                for a1, a2 in _segs(ca)
                for b1, b2 in _segs(cb)
            )
        if tb == "POLYGON":
            ring = np.vstack([cb, cb[:1]])
            return any(_point_in_or_on(p, cb) for p in ca) or any(
                _seg_intersect(a1, a2, b1, b2)
                for a1, a2 in _segs(ca)
                for b1, b2 in _segs(ring)
            )
    if ta == "POLYGON" and tb == "POLYGON":
        ra, rb = np.vstack([ca, ca[:1]]), np.vstack([cb, cb[:1]])
        return (
            any(_point_in_or_on(p, cb) for p in ca)
            or any(_point_in_or_on(p, ca) for p in cb)
            or any(
                _seg_intersect(a1, a2, b1, b2)
                for a1, a2 in _segs(ra)
                for b1, b2 in _segs(rb)
            )
        )
    return _min_dist(ca, cb) == 0.0


@F.pandas_udf(T.BooleanType())
def _st_disjoint_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    inter = st_intersects.func(a, b)
    return inter.map(lambda v: None if v is None else not v)


def st_disjoint(a, b):
    return ~st_intersects(a, b)


# ------------------------------------------------------------------ WKB
# real little-endian WKB (the reference round-trips via geozero —
# st_asbinary.slt pins exact hex like 0101000000...)

_WKB_CODES = {
    "POINT": 1, "LINESTRING": 2, "POLYGON": 3, "MULTIPOINT": 4,
    "MULTILINESTRING": 5, "MULTIPOLYGON": 6, "GEOMETRYCOLLECTION": 7,
}
_WKB_NAMES = {v: k for k, v in _WKB_CODES.items()}


def _leaf_coords(leaf) -> list[tuple[float, float]]:
    txt = leaf[0] if isinstance(leaf, list) else leaf
    return [(float(a), float(b)) for a, b in _COORD_RE.findall(txt)]


def _wkt_to_wkb(wkt: str):
    import struct

    s = wkt.strip().upper()
    t = next((x for x in _WKT_TYPES if s.startswith(x)), None)
    if t is None:
        return None
    body = s[len(t):].strip()
    if not body.startswith("("):
        return None
    hdr = b"\x01" + struct.pack("<I", _WKB_CODES[t])

    def pts(coords):
        return struct.pack("<I", len(coords)) + b"".join(
            struct.pack("<dd", x, y) for x, y in coords
        )

    nest, _ = _parse_nest(body)
    node = nest[0] if nest else []
    try:
        if t == "POINT":
            c = _leaf_coords(node)
            if len(c) != 1:
                return None
            return hdr + struct.pack("<dd", *c[0])
        if t == "LINESTRING":
            c = _leaf_coords(node)
            return None if not c else hdr + pts(c)
        if t == "POLYGON":
            rings = [_leaf_coords(r) for r in node]
            if not rings or any(not r for r in rings):
                return None
            return hdr + struct.pack("<I", len(rings)) + b"".join(pts(r) for r in rings)
        if t == "MULTIPOINT":
            # both 'MULTIPOINT (10 40, 40 30)' and '((10 40),(40 30))' forms
            c = (
                [_leaf_coords(p)[0] for p in node]
                if node and isinstance(node[0], list)
                else _leaf_coords(node)
            )
            return hdr + struct.pack("<I", len(c)) + b"".join(
                b"\x01" + struct.pack("<Idd", 1, x, y) for x, y in c
            )
        if t == "MULTILINESTRING":
            lines = [_leaf_coords(l) for l in node]
            return hdr + struct.pack("<I", len(lines)) + b"".join(
                b"\x01" + struct.pack("<I", 2) + pts(l) for l in lines
            )
        if t == "MULTIPOLYGON":
            polys = [[_leaf_coords(r) for r in poly] for poly in node]
            out = hdr + struct.pack("<I", len(polys))
            for rings in polys:
                out += b"\x01" + struct.pack("<II", 3, len(rings))
                out += b"".join(pts(r) for r in rings)
            return out
        if t == "GEOMETRYCOLLECTION":
            members = [_wkt_to_wkb(m) for m in _collection_members(s)]
            if any(m is None for m in members):
                return None
            return hdr + struct.pack("<I", len(members)) + b"".join(members)
    except (ValueError, IndexError):
        return None
    return None


def _fmt_num(v: float) -> str:
    return str(int(v)) if v == int(v) else repr(v)


def _wkb_to_wkt(buf: bytes):
    import struct

    def rd(off):
        little = buf[off] == 1
        bo = "<" if little else ">"
        (code,) = struct.unpack_from(bo + "I", buf, off + 1)
        t = _WKB_NAMES.get(code)
        off += 5

        def coords(n, off):
            out = []
            for _ in range(n):
                x, y = struct.unpack_from(bo + "dd", buf, off)
                out.append(f"{_fmt_num(x)} {_fmt_num(y)}")
                off += 16
            return out, off

        if t == "POINT":
            c, off = coords(1, off)
            return f"POINT({c[0]})", off
        if t == "LINESTRING":
            (n,) = struct.unpack_from(bo + "I", buf, off)
            c, off = coords(n, off + 4)
            return f"LINESTRING({','.join(c)})", off
        if t == "POLYGON":
            (nr,) = struct.unpack_from(bo + "I", buf, off)
            off += 4
            rings = []
            for _ in range(nr):
                (n,) = struct.unpack_from(bo + "I", buf, off)
                c, off = coords(n, off + 4)
                rings.append(f"({','.join(c)})")
            return f"POLYGON({','.join(rings)})", off
        if t in ("MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION"):
            (n,) = struct.unpack_from(bo + "I", buf, off)
            off += 4
            parts = []
            for _ in range(n):
                w, off = rd(off)
                if t == "MULTIPOINT":
                    w = w[len("POINT("):-1]
                elif t == "MULTILINESTRING":
                    w = "(" + w[len("LINESTRING("):]
                elif t == "MULTIPOLYGON":
                    w = "(" + w[len("POLYGON("):]
                parts.append(w)
            return f"{t}({','.join(parts)})", off
        raise ValueError(f"unknown WKB geometry code {code}")

    wkt, _ = rd(0)
    return wkt


@F.pandas_udf(T.BinaryType())
def st_asbinary(g: pd.Series) -> pd.Series:
    """WKT → WKB bytes; unparseable input → NULL (geozero parse failure →
    NULL: st_asbinary.slt:27 'POINT(0, 0)', and every non-geometry typed
    column at :160-250)."""
    return g.map(
        lambda w: None if pd.isna(w) else _wkt_to_wkb(str(w))
    )


@F.pandas_udf(T.StringType())
def st_geomfromwkb(b: pd.Series) -> pd.Series:
    """WKB bytes → canonical WKT (geozero rendering: no space after the
    type name, comma-separated coordinates)."""
    return b.map(lambda v: None if v is None else _wkb_to_wkt(bytes(v)))


def register(spark) -> None:
    """Expose the GIS kernels as SQL scalar functions (the reference
    registers geo fns with DataFusion — function/gis/*.slt call them
    directly from SQL)."""
    spark.udf.register("st_distance", st_distance)
    spark.udf.register("st_area", st_area)
    spark.udf.register("st_contains", st_contains)
    spark.udf.register("st_within", st_within)
    spark.udf.register("st_equals", st_equals)
    spark.udf.register("st_intersects", st_intersects)
    spark.udf.register("st_disjoint", _st_disjoint_udf)
    spark.udf.register("st_asbinary", st_asbinary)
    spark.udf.register("st_geomfromwkb", st_geomfromwkb)
