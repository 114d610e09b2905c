#!/usr/bin/env python3
"""Independent ristretto255 + ECMH cross-check (driver-side tooling).

A from-scratch pure-Python implementation of the ristretto255 group
(RFC 9496: Edwards25519 internal representation, SQRT_RATIO_M1, the
one-way MAP/Elligator, canonical ENCODE) and of the ECMH multiset-hash
construction over it (base-point-initialized accumulator, insert = add
hash-to-group(SHA-512(item))) — written ONLY from the RFC's pseudocode,
sharing no code or structure with the Scala engine implementation
(`graft.crypto.Ristretto255` / `graft.crypto.Ecmh`).

Purpose: the reference's ECMH digests are produced by go-ristretto,
which needs a Go toolchain this environment lacks. Until that literal
diff is possible, this second, independent implementation closes the
implementation-bug half of the risk: both implementations must agree on
the RFC Appendix-A vectors AND on arbitrary ECMH digests
(insert/remove/union/difference algebra included).

Usage:
  python3 tools/ristretto_check.py            # self-check vs RFC vectors
  python3 tools/ristretto_check.py dump.txt   # + diff vs EcmhDump output
"""
import hashlib
import sys

P = 2**255 - 19
D = (-121665 * pow(121666, P - 2, P)) % P
SQRT_M1 = pow(2, (P - 1) // 4, P)
assert (SQRT_M1 * SQRT_M1) % P == P - 1


def _sqrt_ratio_m1(u, v):
    """RFC 9496 §4.2 SQRT_RATIO_M1: (was_square, sqrt(u/v) or sqrt(i*u/v))."""
    v3 = (v * v % P) * v % P
    v7 = (v3 * v3 % P) * v % P
    r = (u * v3 % P) * pow(u * v7 % P, (P - 5) // 8, P) % P
    check = v * r % P * r % P
    correct = check == u % P
    flipped = check == (-u) % P
    flipped_i = check == (-u * SQRT_M1) % P
    if flipped or flipped_i:
        r = r * SQRT_M1 % P
    if r % 2 == 1:  # CT_ABS: negative = odd LE encoding
        r = (-r) % P
    return (correct or flipped), r


def _sqrt(x):
    ok, r = _sqrt_ratio_m1(x, 1)
    if not ok:
        raise ValueError("not a square")
    return r


# constants derived (not transcribed). The RFC's SQRT_AD_MINUS_ONE is
# the NEGATIVE (odd-LE) root of a*d-1 = -d-1: both roots satisfy the
# square, but MAP's X coordinate flips sign with it — the A.3 vectors
# pin the choice (the CT_ABS root fails them, the negated root passes).
ONE_MINUS_D_SQ = (1 - D * D) % P
D_MINUS_ONE_SQ = (D - 1) * (D - 1) % P
SQRT_AD_MINUS_ONE = (-_sqrt((-1 - D) % P)) % P
INVSQRT_A_MINUS_D = _sqrt_ratio_m1(1, (-1 - D) % P)[1]  # 1/sqrt(a-d)


def _map(t):
    """RFC 9496 §4.3.4 MAP: field element -> extended (X, Y, Z, T)."""
    r = SQRT_M1 * t % P * t % P
    u = (r + 1) % P * ONE_MINUS_D_SQ % P
    v = (-1 - r * D) % P * ((r + D) % P) % P
    was_square, s = _sqrt_ratio_m1(u, v)
    if not was_square:
        s_t = s * t % P
        if s_t % 2 == 1:
            s_t = (-s_t) % P
        s = (-s_t) % P
        c = r
    else:
        c = (-1) % P
    n = (c * ((r - 1) % P) % P * D_MINUS_ONE_SQ - v) % P
    w0 = 2 * s * v % P
    w1 = n * SQRT_AD_MINUS_ONE % P
    w2 = (1 - s * s) % P
    w3 = (1 + s * s) % P
    return (w0 * w3 % P, w2 * w1 % P, w1 * w3 % P, w0 * w2 % P)


def add(p, q):
    """Extended-coordinate Edwards25519 addition (a = -1)."""
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = (y1 - x1) * (y2 - x2) % P
    b = (y1 + x1) * (y2 + x2) % P
    c = t1 * 2 * D % P * t2 % P
    d2 = z1 * 2 * z2 % P
    e, f, g, h = (b - a) % P, (d2 - c) % P, (d2 + c) % P, (b + a) % P
    return (e * f % P, g * h % P, f * g % P, e * h % P)


def neg(p):
    x, y, z, t = p
    return ((-x) % P, y, z, (-t) % P)


IDENTITY = (0, 1, 1, 0)
# generator: y = 4/5, x recovered (even root), same curve equation
_gy = 4 * pow(5, P - 2, P) % P
_gxx = (_gy * _gy - 1) * pow(D * _gy % P * _gy % P + 1, P - 2, P) % P
_gx = _sqrt(_gxx)
if _gx % 2 == 1:
    _gx = (-_gx) % P
BASE = (_gx, _gy, 1, _gx * _gy % P)


def encode(p):
    """RFC 9496 §4.3.2 canonical 32-byte encoding."""
    x0, y0, z0, t0 = p
    u1 = (z0 + y0) % P * ((z0 - y0) % P) % P
    u2 = x0 * y0 % P
    _, invsqrt = _sqrt_ratio_m1(1, u1 * u2 % P * u2 % P)
    den1 = invsqrt * u1 % P
    den2 = invsqrt * u2 % P
    z_inv = den1 * den2 % P * t0 % P
    if (t0 * z_inv % P) % 2 == 1:  # rotate
        x, y = y0 * SQRT_M1 % P, x0 * SQRT_M1 % P
        den_inv = den1 * INVSQRT_A_MINUS_D % P
    else:
        x, y, den_inv = x0, y0, den2
    if (x * z_inv % P) % 2 == 1:
        y = (-y) % P
    s = den_inv * ((z0 - y) % P) % P
    if s % 2 == 1:
        s = (-s) % P
    return s.to_bytes(32, "little").hex()


def from_uniform(b64):
    """RFC 9496 §4.3.4: 64 uniform bytes -> element (two MAP halves added)."""
    def half(b):
        t = int.from_bytes(b, "little") & ((1 << 255) - 1)
        return _map(t % P)
    return add(half(b64[:32]), half(b64[32:64]))


def derive(item: bytes):
    """The dalek derivation the engine and the reference share:
    hash-to-group of SHA-512(item)."""
    return from_uniform(hashlib.sha512(item).digest())


class MultisetHash:
    """ECMH accumulator, reference-shaped: starts at the BASE point."""

    def __init__(self, acc=None):
        self.acc = BASE if acc is None else acc

    def insert(self, item: bytes):
        self.acc = add(self.acc, derive(item)); return self

    def remove(self, item: bytes):
        self.acc = add(self.acc, neg(derive(item))); return self

    def union(self, other):
        self.acc = add(self.acc, other.acc); return self

    def difference(self, other):
        self.acc = add(self.acc, neg(other.acc)); return self

    def digest(self):
        return encode(self.acc)


def self_check():
    # RFC 9496 A.1: B*0..B*15
    a1 = [
        "0000000000000000000000000000000000000000000000000000000000000000",
        "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
        "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
        "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
        "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
        "e882b131016b52c1d3337080187cf768423efccbb517bb495ab812c4160ff44e",
        "f64746d3c92b13050ed8d80236a7f0007c3b3f962f5ba793d19a601ebb1df403",
        "44f53520926ec81fbd5a387845beb7df85a96a24ece18738bdcfa6a7822a176d",
        "903293d8f2287ebe10e2374dc1a53e0bc887e592699f02d077d5263cdd55601c",
        "02622ace8f7303a31cafc63f8fc48fdc16e1c8c8d234b2f0d6685282a9076031",
        "20706fd788b2720a1ed2a5dad4952b01f413bcf0e7564de8cdc816689e2db95f",
        "bce83f8ba5dd2fa572864c24ba1810f9522bc6004afe95877ac73241cafdab42",
        "e4549ee16b9aa03099ca208c67adafcafa4c3f3e4e5303de6026e3ca8ff84460",
        "aa52e000df2e16f55fb1032fc33bc42742dad6bd5a8fc0be0167436c5948501f",
        "46376b80f409b29dc2b5f6f0c52591990896e5716f41477cd30085ab7f10301e",
        "e0c418f7c8d9c4cdd7395b93ea124f3ad99021bb681dfc3302a9d99a2e53e64e",
    ]
    acc = IDENTITY
    for k, want in enumerate(a1):
        assert encode(acc) == want, f"A.1 B*{k}"
        acc = add(acc, BASE)
    # RFC 9496 A.3: one-way map of SHA-512(label)
    a3 = [
        ("Ristretto is traditionally a short shot of espresso coffee",
         "3066f82a1a747d45120d1740f14358531a8f04bbffe6a819f86dfe50f44a0a46"),
        ("about half the amount of water in the same amount of time",
         "006ccd2a9e6867e6a2c5cea83d3302cc9de128dd2a9a57dd8ee7b9d7ffe02826"),
        ("by using a finer grind.",
         "f8f0c87cf237953c5890aec3998169005dae3eca1fbb04548c635953c817f92a"),
        ("This produces a concentrated shot of coffee per volume.",
         "ae81e7dedf20a497e10c304a765c1767a42d6e06029758d2d7e8ef7cc4c41179"),
    ]
    for label, want in a3:
        assert encode(derive(label.encode())) == want, f"A.3 {label!r}"
    # ECMH algebra: order independence; union/difference round trip
    m1 = MultisetHash().insert(b"a").insert(b"b").insert(b"c")
    m2 = MultisetHash().insert(b"c").insert(b"a").insert(b"b")
    assert m1.digest() == m2.digest()
    m3 = MultisetHash().insert(b"a").insert(b"b")
    assert MultisetHash().insert(b"a").insert(b"b").insert(b"x").remove(b"x").digest() == m3.digest()
    print("[ristretto-check] self-check OK: RFC A.1 + A.3 + ECMH algebra")


def cross_diff(path):
    """Diff digests against `sbt runMain graft.crypto.EcmhDump` output:
    lines of `<case-name>\t<hex-digest>`; case names encode the inputs."""
    n = 0
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        name, want = line.split("\t")
        if name == "empty":
            got = MultisetHash().digest()
        elif name.startswith("insert:"):
            m = MultisetHash()
            for item in name[len("insert:"):].split(","):
                m.insert(item.encode())
            got = m.digest()
        elif name.startswith("remove:"):  # insert a,b,c then remove the named
            m = MultisetHash().insert(b"a").insert(b"b").insert(b"c")
            m.remove(name[len("remove:"):].encode())
            got = m.digest()
        elif name == "union(ab,cd)":
            got = (MultisetHash().insert(b"a").insert(b"b")
                   .union(MultisetHash().insert(b"c").insert(b"d")).digest())
        elif name == "difference(abcd,cd)":
            got = (MultisetHash().insert(b"a").insert(b"b").insert(b"c").insert(b"d")
                   .difference(MultisetHash().insert(b"c").insert(b"d")).digest())
        elif name.startswith("bytes:"):  # raw hex byte-string item
            got = MultisetHash().insert(bytes.fromhex(name[len("bytes:"):])).digest()
        else:
            raise ValueError(f"unknown case {name}")
        assert got == want, f"MISMATCH {name}: python {got} != scala {want}"
        n += 1
    print(f"[ristretto-check] cross-diff OK: {n} digests agree with the Scala engine")


if __name__ == "__main__":
    self_check()
    if len(sys.argv) > 1:
        cross_diff(sys.argv[1])
