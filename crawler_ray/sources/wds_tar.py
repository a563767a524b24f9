"""WebDataset-style tar shards: a spec-implemented POSIX ustar writer and
reader (pure python, no tarfile import on the engine path — the same
"real codec, independently-verified" standard as the WAV/video container
in synthetic_media.py; tests assert byte-identity against stdlib
``tarfile`` and the goldens are WRITTEN with stdlib tarfile, so engine
and oracle meet only at the published format).

A WebDataset sample is the group of members sharing a basename: here
``{image_id}.png`` (the stored image bytes) followed by
``{image_id}.json`` (the canonical metadata line, same serialization as
the JSONL sidecar). All headers are deterministic — mtime 0, uid/gid 0,
empty uname/gname, mode 0644 — so shard bytes (and their digests) are
reproducible anywhere, which is what makes the export resumable and the
driver check exact.

Format notes (POSIX.1-1988 ustar, what ``tarfile.USTAR_FORMAT`` emits):
512-byte header; numeric fields are zero-filled octal ASCII terminated
by NUL ("%07o\\0" for 8-byte fields, "%011o\\0" for 12-byte); the
checksum is the byte sum of the header with the checksum field as 8
spaces, stored as "%06o\\0 "; member data is NUL-padded to 512; the
archive ends with two zero blocks and is NUL-padded to a 10240-byte
record boundary.
"""

from __future__ import annotations

BLOCK = 512
RECORD = 10240  # POSIX record size; archives are padded to this multiple


def _octal(n: int, width: int) -> bytes:
    return ("%0*o" % (width - 1, n)).encode("ascii") + b"\0"


def ustar_member(name: str, data: bytes) -> bytes:
    """One ustar member: 512-byte header + NUL-padded data blocks."""
    nm = name.encode("utf-8")
    if len(nm) > 100:
        raise ValueError(f"ustar name too long ({len(nm)} > 100): {name!r}")
    if len(data) >= 8**11:
        # the 12-byte octal size field tops out below 8 GiB; a longer
        # _octal() would silently RESIZE the bytearray header and corrupt
        # every following field (stdlib tarfile raises here too)
        raise ValueError(f"ustar member too large ({len(data)} >= 8**11)")
    hdr = bytearray(BLOCK)
    hdr[0:len(nm)] = nm                              # name
    hdr[100:108] = _octal(0o644, 8)                  # mode
    hdr[108:116] = _octal(0, 8)                      # uid
    hdr[116:124] = _octal(0, 8)                      # gid
    hdr[124:136] = _octal(len(data), 12)             # size
    hdr[136:148] = _octal(0, 12)                     # mtime
    hdr[148:156] = b" " * 8                          # chksum placeholder
    hdr[156:157] = b"0"                              # typeflag: regular file
    hdr[257:265] = b"ustar\x0000"                    # magic + version
    # uname/gname empty; devmajor/devminor stay all-NUL for regular files
    # (what stdlib tarfile emits — octal zeros there would change the
    # checksum and break byte-identity)
    chk = sum(hdr)
    hdr[148:156] = ("%06o" % chk).encode("ascii") + b"\0 "
    pad = (-len(data)) % BLOCK
    return bytes(hdr) + data + b"\0" * pad


def tar_bytes(members: list[tuple[str, bytes]]) -> bytes:
    """A complete deterministic ustar archive from (name, data) members."""
    body = b"".join(ustar_member(n, d) for n, d in members)
    body += b"\0" * (2 * BLOCK)
    body += b"\0" * ((-len(body)) % RECORD)
    return body


def parse_ustar(data: bytes) -> list[tuple[str, bytes]]:
    """Walk a ustar archive → [(name, member_bytes)]; validates magic and
    the stored checksum of every header (a corrupt shard fails loudly)."""
    return [(n, data[off:off + size])
            for n, off, size in iter_ustar_index(data)]


def iter_ustar_index(data: bytes) -> list[tuple[str, int, int]]:
    """The archive's member table WITHOUT copying payloads:
    [(name, data_offset, size)] — what a random-access sample index
    stores so a trainer can pread one member from object storage. Fails
    loudly on bad magic, a bad header checksum, a member whose data runs
    past EOF, or a missing end-of-archive marker (a truncated shard copy
    must never parse as a shorter valid shard)."""
    out: list[tuple[str, int, int]] = []
    pos = 0
    while True:
        if pos + BLOCK > len(data):
            raise ValueError(
                f"truncated ustar archive: no end-of-archive marker "
                f"(offset {pos}, len {len(data)})")
        hdr = data[pos:pos + BLOCK]
        if hdr == b"\0" * BLOCK:
            break
        if hdr[257:263] != b"ustar\x00":
            raise ValueError(f"bad ustar magic at offset {pos}")
        stored = int(hdr[148:155].rstrip(b"\0 ").decode("ascii"), 8)
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != calc:
            raise ValueError(f"ustar checksum mismatch at offset {pos}")
        name = hdr[0:100].split(b"\0", 1)[0].decode("utf-8")
        size = int(hdr[124:135].rstrip(b"\0 ").decode("ascii"), 8)
        end = pos + BLOCK + size
        if end > len(data):
            raise ValueError(
                f"truncated ustar member {name!r}: data ends at {end}, "
                f"archive is {len(data)} bytes")
        out.append((name, pos + BLOCK, size))
        pos = end + ((-size) % BLOCK)
    return out
