"""Conservative mojibake repair standing in for ``ftfy.fix_text``.

The reference pipeline runs every corpus/dataset text through ftfy
(``/root/reference/scripts/build_fm_index.py:51``,
``make_supervised_dpr_dataset.py:125``, ``make_supervised_kilt_dataset.py:128``)
before indexing.  ftfy is unavailable offline; on Wikipedia-style dumps its
load-bearing contribution is undoing **UTF-8-read-as-cp1252/latin-1 double
encoding** ("cafÃ©" -> "café", "donâ€™t" -> "don’t") -- text that, left
unfixed, can never match a clean query at retrieval time.  This module
implements exactly that class, with a strictness ftfy itself uses: a repair
is applied only when the byte round-trip succeeds for the whole string AND
a mojibake-signature count strictly decreases, so clean text (including
legitimate accented text) is provably a no-op.

Divergence from full ftfy is characterized in
``tests/test_text_divergence.py`` and summarized in PARITY.md: HTML
entities, lone surrogates, and exotic single-byte codecs (koi8-r etc.) are
out of scope -- none of which survive into the KILT/DPR corpus TSVs the
reference pipeline actually consumes.
"""

from __future__ import annotations

import re

# A double-encoded 2- or 3-byte UTF-8 sequence read back as cp1252/latin-1
# always renders as a char in U+00C2..U+00F4 (the lead-byte image) followed
# by a continuation-byte image: U+0080..U+00BF, or one of the cp1252
# remappings of 0x80..0x9F (curly quotes, dashes, dagger, euro, ...).
_CONT = (
    "-¿"
    "€‚ƒ„…†‡ˆ‰Š‹"
    "ŒŽ‘’“”•–—˜™"
    "š›œžŸ"
)
_MOJIBAKE_DIGRAPH = re.compile(f"[Â-ô][{_CONT}]")


def mojibake_signature(text: str) -> int:
    """Count of lead+continuation digraphs -- the double-encoding fingerprint.

    Legitimate accented text almost never places a char from À..ô
    immediately before a continuation-image char ("déjà vu", "À bientôt",
    "naïve" all score 0); every double-encoded multi-byte char scores >=1.
    """
    return len(_MOJIBAKE_DIGRAPH.findall(text))


def _reencode(text: str) -> str | None:
    """utf-8 bytes recovered via cp1252 (latin-1 for cp1252's five holes)."""
    out = bytearray()
    for ch in text:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            cp = ord(ch)
            if cp > 0xFF:  # not representable in any single-byte read
                return None
            out.append(cp)  # latin-1 fallback covers 0x81 0x8D 0x8F 0x90 0x9D
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return None


def fix_mojibake(text: str, max_rounds: int = 3) -> str:
    """Undo UTF-8-as-cp1252 double (or deeper) encoding, conservatively.

    Each round re-encodes the WHOLE string and keeps the result only when
    decoding succeeds end-to-end and ``mojibake_signature`` strictly
    decreases; otherwise the input is returned untouched.  Strings with no
    mojibake digraphs are returned without any byte work.
    """
    sig = mojibake_signature(text)
    for _ in range(max_rounds):
        if sig == 0:
            break
        fixed = _reencode(text)
        if fixed is None:
            break
        new_sig = mojibake_signature(fixed)
        if new_sig >= sig:
            break
        text, sig = fixed, new_sig
    return text
