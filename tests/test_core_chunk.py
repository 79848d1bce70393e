"""Chunker semantics (reference enhanced_crawler.py:410-446 and
utils.py:47-87) + property tests.

``ref_chunk_content`` is a literal transcription of the reference loop with
an iteration fuse that returns None when the reference would never
terminate (its cursor reaches a fixpoint). Our ``chunk_content`` must equal
it whenever it terminates — including the negative-cursor path where the
reference leans on Python negative-index slicing — and must still
terminate (with a documented forced advance) when the reference would not.
"""

import random

from crawler_spark.core.text import chunk_content, chunk_text


def ref_chunk_content(content, chunk_size=1000, overlap=100, max_iters=50_000):
    chunks = []
    start = 0
    n = len(content)
    iters = 0
    while start < n:
        iters += 1
        if iters > max_iters:
            return None  # reference would not terminate
        end = start + chunk_size
        if end >= n:
            chunks.append(content[start:])
            break
        bp = content.rfind("\n\n", start, end)
        if bp == -1:
            bp = content.rfind(". ", start, end)
        if bp == -1:
            bp = content.rfind(" ", start, end)
        if bp == -1:
            bp = end
        else:
            bp += 1
        chunks.append(content[start:bp])
        start = bp - overlap
    return chunks


def words_text(rng, n):
    out = []
    for _ in range(n):
        w = rng.choice(["alpha", "beta", "gamma", "delta."])
        out.append(w)
        if w == "delta." and rng.random() < 0.3:
            out.append("\n\n")
    return " ".join(out)


class TestChunkContent:
    def test_short_single_chunk(self):
        assert chunk_content("hello world") == ["hello world"]

    def test_break_preference_paragraph(self):
        text = ("a" * 500) + "\n\n" + ("b" * 900)
        chunks = chunk_content(text)
        # last \n\n in [0,1000) is at 500 -> break_point 501
        assert chunks[0] == ("a" * 500) + "\n"
        # next start 401; same break re-found -> reference fixpoint; we
        # force-advance to 402 and finish
        assert chunks[1] == ("a" * 99) + "\n"
        assert chunks[2] == text[402:]
        assert ref_chunk_content(text) is None  # reference hangs here

    def test_overlap(self):
        text = ("x" * 990) + ". " + ("y" * 2000)
        chunks = chunk_content(text)
        # '. ' at 990 -> bp 991; next start 891
        assert chunks[0].endswith("x.")
        assert chunks[1][:99] == "x" * 99
        # the '. ' stays inside every later window (no breaks in the y run)
        # -> reference fixpoint; our forced advance terminates
        assert ref_chunk_content(text) is None
        assert chunks[-1].endswith("y" * 100)

    def test_negative_cursor_matches_reference(self):
        # early break within overlap of position 0 -> cursor goes negative;
        # the reference emits an empty chunk via negative-index slicing and
        # recovers — we must match exactly
        text = "ab cd" + "z" * 3000
        ref = ref_chunk_content(text)
        assert ref is not None
        assert chunk_content(text) == ref
        assert "" in ref  # the tell-tale empty chunk

    def test_matches_reference_on_random_text(self):
        rng = random.Random(7)
        agreed = 0
        for _ in range(60):
            text = words_text(rng, rng.randrange(0, 1200))
            ref = ref_chunk_content(text)
            got = chunk_content(text)
            if ref is None:
                assert got  # we terminate even when the reference can't
            else:
                assert got == ref
                agreed += 1
        assert agreed >= 50  # the equality branch dominates

    def test_coverage_no_gaps(self):
        rng = random.Random(11)
        for _ in range(25):
            text = words_text(rng, rng.randrange(1, 2000))
            if ref_chunk_content(text) is None:
                continue
            chunks = chunk_content(text)
            pos = 0
            for i, ch in enumerate(chunks):
                assert text[pos : pos + len(ch)] == ch
                if i < len(chunks) - 1:
                    pos = pos + len(ch) - 100
            assert pos + len(chunks[-1]) == len(text)


class TestChunkText:
    def test_never_called_strategy_matches_spec(self):
        text = ("a" * 4000) + "\n\n" + ("b" * 3000)
        chunks = chunk_text(text)
        assert chunks[0] == ("a" * 4000) + "\n\n"
        assert chunks[1] == "b" * 3000

    def test_no_overlap_covers_exactly(self):
        rng = random.Random(3)
        text = words_text(rng, 5000)
        chunks = chunk_text(text)
        assert "".join(chunks) == text
