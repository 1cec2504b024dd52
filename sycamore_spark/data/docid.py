"""Document-id scheme: typed nanoid docids with an invertible UUID form.

Reference parity: ``data/docid.py`` — ids look like ``aryn:d-<23 base36
chars>`` (~119 bits; type codes d=document f=file c=chunk e=entity) and
convert losslessly to RFC-9562 version-4 UUIDs: the 119-bit value is laid
out as 30 little-endian nybbles with the version nybble spliced in at
position 12 and the variant nybble (``8 | type_index``) at 16, so the type
survives the round trip. The reference mints ids with a random nanoid;
an engine wants DETERMINISTIC ids, so minting here is content-addressed
(sha256 of a seed string reduced mod 36^23) — same format, reproducible
runs. ``path_to_sha256_docid`` matches the reference's path-hash variant
byte-for-byte and has a pure-native column form (``docid_expr``).
"""

from __future__ import annotations

import hashlib

ALPHA36 = "0123456789abcdefghijklmnopqrstuvwxyz"
TYPE_CODES = "dfce"  # document, file, chunk, entity
NANOID_CHARS = 23


def deterministic_nanoid36(seed: str) -> str:
    """23 base36 chars derived from sha256(seed) — the deterministic
    stand-in for the reference's random nanoid (same alphabet/length)."""
    x = int.from_bytes(hashlib.sha256(seed.encode("utf-8")).digest(), "big")
    x %= 36 ** NANOID_CHARS
    out = []
    for _ in range(NANOID_CHARS):
        x, r = divmod(x, 36)
        out.append(ALPHA36[r])
    return "".join(reversed(out))


def mkdocid(seed: str, code: str = "d") -> str:
    return f"aryn:{code}-{deterministic_nanoid36(seed)}"


def _b36_decode(s: str) -> int:
    x = 0
    for ch in s:
        x = x * 36 + ALPHA36.index(ch)
    return x


def docid_to_uuid(docid: str | None) -> str | None:
    """aryn:<t>-<nanoid36> -> v4-layout UUID; non-docids pass through."""
    if not docid or not docid.startswith("aryn:"):
        return docid
    typ, _, val = docid[5:].partition("-")
    extra = TYPE_CODES.index(typ) if typ in TYPE_CODES else 0
    x = _b36_decode(val)
    nyb = []
    for _ in range(30):  # little-endian nybbles of the 119-bit value
        x, r = divmod(x, 16)
        nyb.append(r)
    nyb.insert(12, 4)           # version 4
    nyb.insert(16, 8 | (extra & 7))  # OSF DCE variant + type
    hexstr = "".join("0123456789abcdef"[n] for n in nyb)
    return f"{hexstr[:8]}-{hexstr[8:12]}-{hexstr[12:16]}-{hexstr[16:20]}-{hexstr[20:]}"


def uuid_to_docid(uu: str | None, code: str | None = None) -> str | None:
    if not uu:
        return uu
    nyb = [int(c, 16) for c in uu if c != "-"]
    extra = nyb[16] & 7
    del nyb[16]
    del nyb[12]
    x = 0
    for n in reversed(nyb):
        x = x * 16 + n
    out = []
    for _ in range(NANOID_CHARS):
        x, r = divmod(x, 36)
        out.append(ALPHA36[r])
    nanoid = "".join(reversed(out))
    return f"aryn:{code or TYPE_CODES[extra]}-{nanoid}"


def path_to_sha256_docid(path: str) -> str:
    return f"path-sha256-{hashlib.sha256(path.encode('utf-8')).hexdigest()}"


def docid_expr(col):
    """Column form of ``path_to_sha256_docid`` — pure native (sha2), so
    id minting never leaves the JVM and replays in any engine's sha256."""
    from pyspark.sql import functions as F

    return F.concat(F.lit("path-sha256-"), F.sha2(col.cast("string"), 256))
