"""Skin-tone-modifier and keycap emoji coverage.

The reference's alias map is the full enescakir/emoji map (reference:
src/inference/emoji.go:27-40), which includes every RGI tone variant and the
keycap sequences; these tests pin the same coverage in runtime/gemoji.py and
drive toned/keycap streams end-to-end through the console path the way the
reference's TestSimulatedEmojiOutput* harness does (cmd/main_test.go:96-142).
"""

from llama_nuts_and_bolts_tpu.runtime.emoji import segment_emoji
from llama_nuts_and_bolts_tpu.runtime.gemoji import alias_table, lookup

from tests.test_console import CONSOLE_ENGINE, CONSOLE_RANKS, _drive

TONES = {
    "\U0001F3FB": "light_skin_tone",
    "\U0001F3FC": "medium_light_skin_tone",
    "\U0001F3FD": "medium_skin_tone",
    "\U0001F3FE": "medium_dark_skin_tone",
    "\U0001F3FF": "dark_skin_tone",
}


def test_toned_singles_all_five_tones():
    for tone, suffix in TONES.items():
        assert lookup("\U0001F44D" + tone) == f":thumbs_up_{suffix}:"
        assert lookup("\U0001F44B" + tone) == f":waving_hand_{suffix}:"


def test_toned_form_drops_vs16():
    # untoned RGI form carries VS16; toned form must NOT (UTS #51 §2.4)
    assert lookup("✌️") == ":victory_hand:"
    assert lookup("✌\U0001F3FF") == ":victory_hand_dark_skin_tone:"
    assert lookup("✌️\U0001F3FF") is None


def test_toned_gendered_zwj():
    seq = "\U0001F926\U0001F3FE‍♂️"
    assert lookup(seq) == ":man_facepalming_medium_dark_skin_tone:"
    seq = "\U0001F3CB\U0001F3FB‍♀️"  # FE0F base, toned
    assert lookup(seq) == ":woman_lifting_weights_light_skin_tone:"


def test_non_modifier_bases_have_no_toned_entries():
    # people_with_bunny_ears / people_wrestling are not Emoji_Modifier_Base
    assert lookup("\U0001F46F\U0001F3FD") is None
    assert lookup("\U0001F93C\U0001F3FD") is None


def test_toned_professions_and_hair():
    assert (lookup("\U0001F469\U0001F3FB‍\U0001F680")
            == ":woman_astronaut_light_skin_tone:")
    assert (lookup("\U0001F468\U0001F3FF‍⚕️")
            == ":man_health_worker_dark_skin_tone:")
    assert (lookup("\U0001F468\U0001F3FC‍\U0001F9B0")
            == ":man_red_hair_medium_light_skin_tone:")


def test_holding_hands_tones():
    # uniform tone: single base + modifier
    assert lookup("\U0001F46D\U0001F3FC") == \
        ":women_holding_hands_medium_light_skin_tone:"
    # mixed tones: ZWJ + handshake form, left tone then right tone
    seq = "\U0001F469\U0001F3FB‍\U0001F91D‍\U0001F468\U0001F3FF"
    assert lookup(seq) == \
        ":woman_and_man_holding_hands_light_skin_tone_dark_skin_tone:"
    # same-tone pairs are NOT ZWJ keys (RGI uses the single + modifier)
    same = "\U0001F469\U0001F3FB‍\U0001F91D‍\U0001F469\U0001F3FB"
    assert lookup(same) is None


def test_keycaps():
    assert lookup("1️⃣") == ":keycap_1:"
    assert lookup("9️⃣") == ":keycap_9:"
    assert lookup("#️⃣") == ":keycap_number_sign:"
    assert lookup("*️⃣") == ":keycap_asterisk:"
    assert lookup("\U0001F51F") == ":keycap_10:"
    # non-RGI bare keycap (no VS16) stays a per-rune fallback
    assert lookup("1⃣") is None


def test_segmentation_takes_whole_toned_sequence():
    assert segment_emoji("\U0001F44D\U0001F3FD") == ["\U0001F44D\U0001F3FD"]
    assert segment_emoji("1️⃣") == ["1️⃣"]
    # toned + plain neighbour split correctly
    parts = segment_emoji("\U0001F44D\U0001F3FD\U0001F44D")
    assert parts == ["\U0001F44D\U0001F3FD", "\U0001F44D"]


def test_every_modifier_base_single_has_five_tones():
    t = alias_table()
    bases = [k for k in t
             if len(k) == 1 and any(lo <= ord(k) <= hi for lo, hi in
                                    __import__("llama_nuts_and_bolts_tpu.runtime.gemoji",
                                               fromlist=["_EMB_RANGES"])._EMB_RANGES)]
    assert len(bases) > 100
    for b in bases:
        for tone, suffix in TONES.items():
            assert b + tone in t, f"missing tone for {t[b]}"
            assert t[b + tone] == f"{t[b]}_{suffix}"


# ------------------------------------------------- streamed console behavior

def _byte_ids(data: bytes):
    return [CONSOLE_RANKS[bytes([b])] for b in data]


def test_streamed_toned_thumbs_up():
    """👍🏽 arriving byte-by-byte is annotated with the toned alias once the
    modifier completes (the reference's map would do the same)."""
    token_ids = _byte_ids("\U0001F44D\U0001F3FD".encode("utf-8")) + \
        _byte_ids(b" ")
    assistant, waiting = _drive(CONSOLE_ENGINE, token_ids,
                                prompt_ids=[CONSOLE_RANKS[b"Hi"]])
    final = [a for a in assistant if a][-1]
    assert ("[:thumbs_up_medium_skin_tone:\\U0001F44D\\U0001F3FD]"
            in final), final
    # before the tone arrives, the bare 👍 annotation is shown
    assert any("[:thumbs_up:\\U0001F44D]" in a for a in assistant)


def test_streamed_keycap_matches_reference_byte_routing():
    """Streaming semantics parity: only byte-fallback tokens route through
    process_emoji (reference: src/inference/tokenize.go:197-239). A keycap's
    leading '1' decodes as a normal text rune and is emitted directly, so the
    reference (and we) annotate only the trailing VS16 + U+20E3 per-rune;
    the :keycap_1: map entry exists for exact-map parity (test_keycaps)."""
    token_ids = _byte_ids("1️⃣".encode("utf-8")) + _byte_ids(b" ")
    assistant, _ = _drive(CONSOLE_ENGINE, token_ids,
                          prompt_ids=[CONSOLE_RANKS[b"Hi"]])
    final = [a for a in assistant if a][-1]
    assert final.startswith("1️⃣"), final
    assert "[:VARIATION SELECTOR-16:\\U0000FE0F]" in final, final
    assert "[:COMBINING ENCLOSING KEYCAP:\\U000020E3]" in final, final


def test_people_holding_hands_all_combos():
    base = "\U0001F9D1‍\U0001F91D‍\U0001F9D1"
    assert lookup(base) == ":people_holding_hands:"
    # equal tones: single CLDR suffix
    seq = "\U0001F9D1\U0001F3FD‍\U0001F91D‍\U0001F9D1\U0001F3FD"
    assert lookup(seq) == ":people_holding_hands_medium_skin_tone:"
    # mixed tones: both suffixes, left then right
    seq = "\U0001F9D1\U0001F3FB‍\U0001F91D‍\U0001F9D1\U0001F3FF"
    assert lookup(seq) == \
        ":people_holding_hands_light_skin_tone_dark_skin_tone:"
    t = alias_table()
    combos = [k for k in t
              if k.startswith("\U0001F9D1") and "\U0001F91D" in k]
    assert len(combos) == 26  # untoned + 25 tone combinations
