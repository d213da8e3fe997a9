"""LSH signature-width rule: expected bucket size constant => linear work."""

from no_ocr_spark.operators.retrieval import lsh_bits_for


def test_lsh_bits_rule():
    assert lsh_bits_for(2_000) == 8        # graded sf0.01 corpus -> 8 bits
    assert lsh_bits_for(1_000_000) == 16   # ceil(log2(1e6/16))
    assert lsh_bits_for(10**9) == 26
    # monotone non-decreasing, floor of 8
    prev = 0
    for n in [10, 100, 10**4, 10**6, 10**8, 10**10]:
        b = lsh_bits_for(n)
        assert b >= max(8, prev)
        prev = b
    # expected bucket size stays bounded: n / 2^bits <= target
    for n in [10**4, 10**6, 10**9]:
        assert n / 2 ** lsh_bits_for(n) <= 16
