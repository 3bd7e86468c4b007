"""Console repaint tests with an intercepted writer — the reference's
fake-console approach (reference: cmd/main_test.go:23-34 InterceptorWriter):
assert the exact sequence of repainted "Assistant:" and "Tokens waiting…"
lines across iterations for emoji token streams.
"""

import io
import re

from llama_nuts_and_bolts_tpu.cli.console import AppState, spaces_after_emoji
from llama_nuts_and_bolts_tpu.runtime.types import TokenPiece

from tests.test_streaming import ENGINE, byte_token_ids

ASSISTANT_RE = re.compile(r'.*\[1mAssistant\s*\:\x1b\[0m \"(.+)\"')
WAITING_RE = re.compile(r'.*\[1mTokens waiting to be processed further\s*\:\x1b\[0m (.+), possibly')


class CapturingOut(io.StringIO):
    """Collects each write as one 'frame' like the reference's interceptor."""

    def __init__(self):
        super().__init__()
        self.frames = []

    def write(self, s):
        if s:
            self.frames.append(s)
        return super().write(s)


def drive(token_ids):
    out = CapturingOut()
    app = AppState(out=out, fixed_width=80)
    prompt_pieces, prompt_text = ENGINE.token_batch_to_string([RANKS_HI])
    app.begin_generation(prompt_pieces, prompt_text, ENGINE.seq_len)
    start = len(out.frames)
    for part in ENGINE.generate_string_from_output_tokens(token_ids):
        app.consume(part)
    app.finish_generation()
    assistant, waiting = [], []
    for frame in out.frames[start:]:
        a = ASSISTANT_RE.search(frame)
        if a:
            assistant.append(a.group(1))
            w = WAITING_RE.search(frame)
            waiting.append(w.group(1) if w else "")
    return assistant, waiting


RANKS_HI = 256 + 3  # b"Hi" in the synthetic vocab (tests/test_streaming.py)


def test_turkey_flag_console_transcript():
    """Flag assembly transcript (reference: TestSimulatedEmojiOutputTurkeyFlag
    expected lines, adapted to our :flag_tr: alias)."""
    ids = byte_token_ids("<0xF0><0x9F><0x87><0xB9>") + byte_token_ids("<0xF0><0x9F><0x87><0xB7>")
    assistant, waiting = drive(ids)
    assert assistant == [
        "…",
        "……",
        "…\u2026…"[0:3],  # three waiting dots
        "\U0001F1F9 [:REGIONAL INDICATOR SYMBOL LETTER T:\\U0001F1F9]",
        "\U0001F1F9 [:REGIONAL INDICATOR SYMBOL LETTER T:\\U0001F1F9]…",
        "\U0001F1F9 [:REGIONAL INDICATOR SYMBOL LETTER T:\\U0001F1F9]……",
        "\U0001F1F9 [:REGIONAL INDICATOR SYMBOL LETTER T:\\U0001F1F9]………",
        "\U0001F1F9\U0001F1F7 [:flag_tr:\\U0001F1F9\\U0001F1F7]",
    ]
    assert waiting == [
        '"<0xF0>"',
        '"<0xF0>", "<0x9F>"',
        '"<0xF0>", "<0x9F>", "<0x87>"',
        "",
        '"<0xF0>"',
        '"<0xF0>", "<0x9F>"',
        '"<0xF0>", "<0x9F>", "<0x87>"',
        "",
    ]


def test_emoji_with_text_console_transcript():
    """Eyes + text token (reference: TestSimulatedEmojiOutputEmojiWithText)."""
    ids = byte_token_ids("<0xF0><0x9F><0x91><0x80>") + [RANKS_HI]
    assistant, waiting = drive(ids)
    assert assistant[3] == "\U0001F440 [:eyes:\\U0001F440]"
    assert assistant[4] == "\U0001F440 [:eyes:\\U0001F440]Hi"
    assert waiting[:4] == ['"<0xF0>"', '"<0xF0>", "<0x9F>"', '"<0xF0>", "<0x9F>", "<0x91>"', ""]


def test_incomplete_emoji_flushed_as_hex():
    ids = byte_token_ids("<0xF0><0x9F>")
    assistant, _ = drive(ids)
    # final repaint shows the flushed byte-fallback text
    assert assistant[-1] == "<0xF0><0x9F>"


def test_spaces_after_emoji():
    assert spaces_after_emoji("") == ""
    assert spaces_after_emoji("[:eyes:\\U0001F440]") == " "
    assert spaces_after_emoji("[a][b]") == "  "
    assert spaces_after_emoji("[a][b][c]") == "  "


def test_erase_sequence_accounts_for_wrapping():
    out = CapturingOut()
    app = AppState(out=out, fixed_width=10)
    app.prompt_text = "x" * 25  # wraps to 3 lines at width 10
    app.update_output()
    frame1_lines = sum(1 for _ in out.frames[-1].split("\n"))
    app.update_output()
    # second frame starts with erase codes for the wrapped lines
    assert out.frames[-1].count("\x1b[2K") >= frame1_lines
