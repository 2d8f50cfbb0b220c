"""Per-page derived statistics — typed-Arrow equivalent of the reference's
pickled ``OcrPageData`` container (/root/reference/StudiOCR/OcrPageData.py).

Reference semantics preserved exactly:

* token filter keeps entries where ``not text.isspace()`` — note the
  empty string **passes** this filter (``''.isspace()`` is False)
  (/root/reference/StudiOCR/OcrPageData.py:31-33, OcrEngine.py:131);
* word stats (``text_counter`` :38, sorted unique ``texts`` :40) and the bbox
  arrays (:48-51) are over the **filtered** tokens;
* char stats (``char_counter`` :43, sorted unique ``chars`` :45) are over
  ``''.join(result_data['text'])`` — the **unfiltered** token list — the
  filtered/unfiltered asymmetry is reference behavior, kept deliberately
  (SURVEY.md §7.4 #4);
* ``confidence_level`` ``dict[text] -> set(conf)`` over filtered tokens
  (:53-62), canonicalized here to sorted unique lists (pickle→Arrow);
* ``char_histogram()`` is a fixed 95-bin frequency vector over printable
  ASCII 32..126 (:84-91).
"""

from __future__ import annotations

from collections import Counter

HIST_LO, HIST_HI = 32, 126  # inclusive, 95 bins


def keep_token(text: str) -> bool:
    """The reference's non-space filter (keeps '' — quirk preserved)."""
    return not text.isspace()


def build_page_stats(tokens: dict[str, list]) -> dict:
    """tokens: pytesseract-shaped parallel arrays (unfiltered).

    Returns a plain dict matching the ``page_stats`` Arrow struct
    (FIXTURES.md §3): texts/text_counts, chars/char_counts, conf_by_text
    (map<string, list<int>> sorted), char_hist (95 ints).
    """
    texts_all = tokens["text"]
    confs_all = tokens["conf"]
    texts_f: list[str] = []
    confs_f: list[int] = []
    ta, ca = texts_f.append, confs_f.append
    for t, c in zip(texts_all, confs_all):
        if not t.isspace():  # keep_token inlined (keeps '', quirk preserved)
            ta(t)
            ca(int(c))

    text_counter = Counter(texts_f)
    texts_sorted = sorted(text_counter)
    text_counts = [text_counter[t] for t in texts_sorted]

    # char stats over the UNFILTERED join (reference asymmetry, G3)
    joined = "".join(texts_all)
    char_counter = Counter(joined)
    chars_sorted = sorted(char_counter)
    char_counts = [char_counter[c] for c in chars_sorted]

    conf_by_text: dict[str, set[int]] = {}
    for t, c in zip(texts_f, confs_f):
        conf_by_text.setdefault(t, set()).add(c)
    conf_map = [(t, sorted(conf_by_text[t])) for t in sorted(conf_by_text)]

    hist = [0] * (HIST_HI - HIST_LO + 1)
    for ch, n in char_counter.items():
        o = ord(ch)
        if HIST_LO <= o <= HIST_HI:
            hist[o - HIST_LO] += n
    return {
        "texts": texts_sorted,
        "text_counts": text_counts,
        "chars": chars_sorted,
        "char_counts": char_counts,
        "conf_by_text": conf_map,
        "char_hist": hist,
    }


def page_tokens(page: dict) -> dict[str, list]:
    """Reconstruct the page's UNFILTERED (text, conf) parallel arrays from a
    stored page row (blocks + dropped) — the inverse of the non-space filter.
    Dropped tokens' conf is irrelevant (the filter removes them from every
    conf-consuming statistic) and set to 0."""
    blocks = page["blocks"]
    dropped = page.get("dropped") or []
    drop_map = {d["pos"]: d["text"] for d in dropped}
    n = len(blocks) + len(dropped)
    texts: list[str] = []
    confs: list[int] = []
    bi = 0
    for pos in range(n):
        t = drop_map.get(pos)
        if t is not None:
            texts.append(t)
            confs.append(0)
        else:
            blk = blocks[bi]
            texts.append(blk["text"])
            confs.append(blk["conf"])
            bi += 1
    return {"text": texts, "conf": confs}


def stats_from_page(page: dict) -> dict:
    """Derive the OcrPageData-equivalent stats for a stored page row —
    byte-equal to computing them from the original token arrays (proved by
    test_page_stats_match_oracle: the oracle computes directly, the pipeline
    through this path)."""
    return build_page_stats(page_tokens(page))
