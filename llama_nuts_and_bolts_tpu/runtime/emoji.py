"""Emoji/grapheme streaming annotation.

Capability parity with the reference's emoji processor (reference:
src/inference/emoji.go:54-164): graphic runes and ZWJ accumulate in
``waiting_runes``; the accumulated string is segmented greedily into the
longest known emoji sequences; recognized sequences are annotated
``[:alias:\\UXXXXXXXX…]`` and unrecognized runes fall back to per-rune
``[:UNICODE NAME:\\UXXXXXXXX]`` — exactly the reference's fallback format.

The reference gets its alias table from the Go ``enescakir/emoji`` package
(gemoji data); this rebuild derives aliases from ``unicodedata`` names
(lowercased, underscores) plus flag-sequence synthesis, and decides "is this
an emoji" from the Unicode Emoji_Presentation property (public UTS-51 data,
inlined below) — so e.g. U+1F570 MANTELPIECE CLOCK (Emoji_Presentation=No)
falls back to name annotation, matching the reference's observable behavior.
"""

from __future__ import annotations

import unicodedata
from typing import List, Optional

from llama_nuts_and_bolts_tpu.runtime.types import DecodingContext

ZWJ = "‍"
VS16 = "️"
_SKIN_TONES = set(range(0x1F3FB, 0x1F400))
_REGIONAL_LO, _REGIONAL_HI = 0x1F1E6, 0x1F1FF

# Unicode Emoji_Presentation=Yes ranges (UTS #51 emoji-data, inclusive).
_EMOJI_PRESENTATION = (
    (0x231A, 0x231B), (0x23E9, 0x23EC), (0x23F0, 0x23F0), (0x23F3, 0x23F3),
    (0x25FD, 0x25FE), (0x2614, 0x2615), (0x2648, 0x2653), (0x267F, 0x267F),
    (0x2693, 0x2693), (0x26A1, 0x26A1), (0x26AA, 0x26AB), (0x26BD, 0x26BE),
    (0x26C4, 0x26C5), (0x26CE, 0x26CE), (0x26D4, 0x26D4), (0x26EA, 0x26EA),
    (0x26F2, 0x26F3), (0x26F5, 0x26F5), (0x26FA, 0x26FA), (0x26FD, 0x26FD),
    (0x2705, 0x2705), (0x270A, 0x270B), (0x2728, 0x2728), (0x274C, 0x274C),
    (0x274E, 0x274E), (0x2753, 0x2755), (0x2757, 0x2757), (0x2795, 0x2797),
    (0x27B0, 0x27B0), (0x27BF, 0x27BF), (0x2B1B, 0x2B1C), (0x2B50, 0x2B50),
    (0x2B55, 0x2B55), (0x1F004, 0x1F004), (0x1F0CF, 0x1F0CF),
    (0x1F18E, 0x1F18E), (0x1F191, 0x1F19A), (0x1F1E6, 0x1F1FF),
    (0x1F201, 0x1F201), (0x1F21A, 0x1F21A), (0x1F22F, 0x1F22F),
    (0x1F232, 0x1F236), (0x1F238, 0x1F23A), (0x1F250, 0x1F251),
    (0x1F300, 0x1F320), (0x1F32D, 0x1F335), (0x1F337, 0x1F37C),
    (0x1F37E, 0x1F393), (0x1F3A0, 0x1F3CA), (0x1F3CF, 0x1F3D3),
    (0x1F3E0, 0x1F3F0), (0x1F3F4, 0x1F3F4), (0x1F3F8, 0x1F43E),
    (0x1F440, 0x1F440), (0x1F442, 0x1F4FC), (0x1F4FF, 0x1F53D),
    (0x1F54B, 0x1F54E), (0x1F550, 0x1F567), (0x1F57A, 0x1F57A),
    (0x1F595, 0x1F596), (0x1F5A4, 0x1F5A4), (0x1F5FB, 0x1F64F),
    (0x1F680, 0x1F6C5), (0x1F6CC, 0x1F6CC), (0x1F6D0, 0x1F6D2),
    (0x1F6D5, 0x1F6D7), (0x1F6DC, 0x1F6DF), (0x1F6EB, 0x1F6EC),
    (0x1F6F4, 0x1F6FC), (0x1F7E0, 0x1F7EB), (0x1F7F0, 0x1F7F0),
    (0x1F90C, 0x1F93A), (0x1F93C, 0x1F945), (0x1F947, 0x1F9FF),
    (0x1FA70, 0x1FA7C), (0x1FA80, 0x1FA88), (0x1FA90, 0x1FABD),
    (0x1FABF, 0x1FAC5), (0x1FACE, 0x1FADB), (0x1FAE0, 0x1FAE8),
    (0x1FAF0, 0x1FAF8),
)


def _has_emoji_presentation(cp: int) -> bool:
    for lo, hi in _EMOJI_PRESENTATION:
        if lo <= cp <= hi:
            return True
    return False


def _is_regional(ch: str) -> bool:
    return _REGIONAL_LO <= ord(ch) <= _REGIONAL_HI


def _is_emoji_base(ch: str) -> bool:
    cp = ord(ch)
    if _is_regional(ch):
        return False  # only meaningful in pairs
    return _has_emoji_presentation(cp)


def is_emoji_sequence(s: str) -> bool:
    """True if ``s`` as a whole is a plausible emoji / emoji sequence."""
    if not s:
        return False
    if len(s) == 2 and _is_regional(s[0]) and _is_regional(s[1]):
        return True
    # split on ZWJ: every element must be base (+VS16) (+skin tone); a VS16
    # after a text-default symbol (e.g. ♂ U+2642) requests emoji presentation,
    # making the pair a valid element even without Emoji_Presentation=Yes
    for elem in s.split(ZWJ):
        if not elem:
            return False
        base, rest = elem[0], elem[1:]
        if not _is_emoji_base(base):
            vs16_promoted = (VS16 in rest
                             and unicodedata.category(base).startswith("S"))
            if not vs16_promoted:
                return False
        for ch in rest:
            if ch != VS16 and ord(ch) not in _SKIN_TONES:
                return False
    return True


def emoji_alias(seq: str) -> Optional[str]:
    """``:alias:`` for a recognized emoji sequence, else None.

    Aliases derive from Unicode names (the reference uses gemoji aliases; the
    annotation format and recognition behavior are what's parity-relevant).
    """
    if not is_emoji_sequence(seq):
        return None
    if len(seq) == 2 and _is_regional(seq[0]):
        cc = "".join(chr(ord(c) - _REGIONAL_LO + ord("a")) for c in seq)
        return f":flag_{cc}:"
    names = []
    for ch in seq:
        if ch in (ZWJ, VS16) or ord(ch) in _SKIN_TONES:
            continue
        try:
            names.append(unicodedata.name(ch).lower().replace(" ", "_").replace("-", "_"))
        except ValueError:
            return None
    if not names:
        return None
    return ":" + "_".join(names) + ":"


def _rune_name(ch: str) -> str:
    try:
        return unicodedata.name(ch)
    except ValueError:
        return f"U+{ord(ch):04X}"


def _rune_annotation(s: str) -> str:
    return "".join(f"[:{_rune_name(ch)}:\\U{ord(ch):08X}]" for ch in s)


def _escapes(s: str) -> str:
    return "".join(f"\\U{ord(ch):08X}" for ch in s)


def segment_emoji(s: str) -> List[str]:
    """Greedy longest-emoji segmentation of ``s`` (reference:
    src/inference/emoji.go:95-164 does the same via substring replacement)."""
    parts: List[str] = []
    i = 0
    while i < len(s):
        matched = None
        for j in range(len(s), i, -1):
            if is_emoji_sequence(s[i:j]):
                matched = s[i:j]
                break
        if matched is None:
            matched = s[i]
        parts.append(matched)
        i += len(matched)
    return parts


def _is_graphic(ch: str) -> bool:
    # Go's unicode.IsGraphic: letters/marks/numbers/punct/symbols/spaces
    return ch.isprintable() or ch == " "


def process_emoji(ctx: DecodingContext, ch: str) -> str:
    """Feed one decoded rune; returns the string to emit now and updates the
    annotation in ``ctx.waiting_runes_extra_str``
    (reference: src/inference/emoji.go:54-93)."""
    if ctx.decoding_finished:
        ctx.decoding_finished = False
    graphic = _is_graphic(ch) or ch == ZWJ
    if graphic:
        ctx.waiting_runes += ch
    ctx.waiting_runes_extra_str = ""
    parts = segment_emoji(ctx.waiting_runes)
    if parts:
        extra = ""
        for part in parts:
            alias = emoji_alias(part)
            if alias is not None:
                extra += f"[{alias}{_escapes(part)}]"
            else:
                extra += _rune_annotation(part)
        ctx.waiting_runes_extra_str = extra
    else:
        ctx.waiting_runes_extra_str = _rune_annotation(ctx.waiting_runes)
    if not graphic:
        extra = ctx.waiting_runes_extra_str
        ctx.waiting_runes = ""
        ctx.waiting_runes_extra_str = ""
        return extra + ch
    return ch
