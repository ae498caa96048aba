"""XXH3-64 pure-python implementation vs reference-compiled vectors.

The expected values were produced by compiling the reference's
vendored xxhash (/root/reference/lib/cfl/lib/xxhash, the library
cfl_hash_64bits aliases to) with gcc and hashing a deterministic
xorshift32 byte buffer at lengths covering every XXH3 code path:
0/1-3/4-8/9-16/17-128/129-240 and the >240 striped long path
including block boundaries (1024) and multi-block inputs.
"""

from fluent_bit_spark.functions.xxh3 import xxh3_64


def _buf(n: int) -> bytes:
    x = 2463534242
    out = bytearray()
    for _ in range(n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


VECTORS = {
    0: 3244421341483603138, 1: 10106114510314666011,
    2: 7466484190668182030, 3: 16170456805437132145,
    4: 3314109749249388696, 5: 4734000545439098591,
    7: 13755214318157015620, 8: 4732037157564055250,
    9: 16565390366925190855, 12: 16982072238700438963,
    16: 6391388576464354536, 17: 5495705111960470598,
    31: 10838854886770136781, 32: 6649835511770944933,
    63: 4036602443482439459, 64: 18230578988215769381,
    96: 7592499522559280509, 97: 5298457305997801784,
    128: 18132430639856695711, 129: 10866222491575383212,
    160: 15727285990061923776, 192: 1593945117035131799,
    240: 17173463059274286017, 241: 17108142974895164560,
    255: 5302838623082108786, 256: 11405648666842422901,
    512: 14884411237520525416, 1023: 14071370187235854321,
    1024: 13090444395651338090, 1025: 5514988659924532497,
    2048: 4836602386199728447, 3000: 1975816843318875141,
    4096: 8296987512745285246,
}

STRINGS = {
    b"": 3244421341483603138,
    b"a": 16629034431890738719,
    b"abc": 8696274497037089104,
    b"hello world": 15296390279056496779,
    b"fb_req_total_NULL_": 7969850512672079454,
    b"fb_req_totalp0": 11392558934943402270,
}


def test_xxh3_all_length_paths():
    data = _buf(4096)
    for n, want in VECTORS.items():
        assert xxh3_64(data[:n]) == want, n


def test_xxh3_strings():
    for s, want in STRINGS.items():
        assert xxh3_64(s) == want, s


def test_streaming_concat_equivalence():
    # cmt_map.c hashes fqname then label values via streaming
    # updates; XXH3 streaming == one-shot over the concatenation
    assert xxh3_64(b"fb_req_total" + b"p0") == STRINGS[b"fb_req_totalp0"]
