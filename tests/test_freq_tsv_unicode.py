"""Reference k-mer filter file format (S6) + non-ASCII shingling parity."""

import numpy as np
import pyarrow as pa

from mhray import kernels as K
from mhray.freq import FreqTable


def test_freq_table_from_tsv(tmp_path):
    """The reference's '-f' file: first line sizes, then kmer TAB
    fraction (docs/source/quickstart.rst:25-33)."""
    p = tmp_path / "filter.tsv"
    p.write_text(
        "4 4\n"
        "AAAATTTTCCCCGGGG\t0.5\n"
        "TTTTAAAACCCCGGGG\t0.25\n"
        "CCCCGGGGAAAATTTT\t0.0125\n"
        "GGGGCCCCAAAATTTT\t0.000001\n"   # below cutoff -> dropped
    )
    ft = FreqTable.from_tsv(str(p), filter_cutoff=1e-5, idf_range=3.0)
    assert len(ft.hashes) == 3           # one entry under the cutoff
    h, _ = K.shingle_hashes64(["AAAATTTTCCCCGGGG"], 16)
    idf_hot = ft.scaled_idf(h)           # the most frequent kmer
    assert idf_hot[0] == 1.0             # maps to the scale minimum
    h2, _ = K.shingle_hashes64(["CCCCGGGGAAAATTTT"], 16)
    assert ft.scaled_idf(h2)[0] > idf_hot[0]
    # absent kmer -> full range
    h3, _ = K.shingle_hashes64(["ACGTACGTACGTACGT"], 16)
    assert ft.scaled_idf(h3)[0] == 3.0
    # remove_unique=1: only file kmers survive
    ft2 = FreqTable.from_tsv(str(p), filter_cutoff=1e-5, remove_unique=1)
    assert ft2.keep_kmer(h)[0]
    assert not ft2.keep_kmer(h3)[0]


def test_non_ascii_shingling_parity():
    """The Arrow ASCII fast path must fall back (not mis-hash) on
    non-ASCII text, and list/column paths must agree."""
    texts = ["café au lait déjà vu encore", "ascii only text here ok",
             "τεχνη και επιστημη μαζι", "日本語のキャプションです"]
    col = pa.array(texts, pa.string())
    for k in (3, 6):
        h_list, off_list = K.shingle_hashes64(texts, k)
        h_col, off_col = K.shingle_hashes64(col, k)
        np.testing.assert_array_equal(h_list, h_col)
        np.testing.assert_array_equal(off_list, off_col)
    ch_l = K.hash_strings64(texts)
    ch_c = K.hash_strings64(col)
    np.testing.assert_array_equal(ch_l, ch_c)
