"""Context-window kernels (SURVEY.md §2.7 F3/F4/F5).

F3  context split: doc[:start] / doc[end:] around a mention.
F4  char-budget ED window — pins the SERVING-path quota formula
    (`/root/reference/src/pipeline.py:123-126`):
        quota = max_len - (len(mention) + 4) // 2
        left[-quota_l:] + "<<" + mention + ">>" + right[:quota_r]
    (the training path `train.py:163-167` uses a subtly different
    `(max-len)//2` split — SURVEY.md §7.4; we pin the serving one).
F5  token-budget CG window — token-level analog with left/right spill-over
    redistribution (`tokenization.py:187-245`), over whitespace tokens
    (the reference's WordPiece stream is model-bound; the budget algebra
    is what we preserve).

Pure kernels: shared by pandas-UDF wrappers and tests.
"""

from __future__ import annotations


def context_split(doc: str, start: int, end: int) -> tuple[str, str, str]:
    """F3: (context_left, mention, context_right) by char offsets."""
    return doc[:start], doc[start:end], doc[end:]


def char_budget_window(
    context_left: str, mention: str, context_right: str, max_len: int = 128
) -> str:
    """F4 serving-path formula, reproduced EXACTLY (pipeline.py:120-126):

        mention_length = len(mention) + 4
        left_quota  = max_len - mention_length // 2
        right_quota = max_len - mention_length - left_quota
        left[-left_quota:] + "<<m>>" + right[:right_quota]

    ``right_quota`` is ALWAYS negative (= -ceil(mention_length/2)) — the
    reference's negative slice keeps the right context minus its LAST
    ceil(mention_length/2) chars.  A quirk, but this string is scoring
    input; byte parity wins (ADVICE r1).  Note python slice semantics are
    part of the spec: ``left[-0:]`` (huge mention) is the WHOLE left."""
    mention_length = len(mention) + 4
    left_quota = max_len - mention_length // 2
    right_quota = max_len - mention_length - left_quota
    return (context_left[-left_quota:] + f"<<{mention}>>"
            + context_right[:right_quota])


def token_budget_window(
    left_tokens: list[str],
    mention_tokens: list[str],
    right_tokens: list[str],
    max_tokens: int = 128,
    mention_cap: int = 16,
) -> list[str]:
    """F5: cap mention at ``mention_cap`` tokens, wrap in markers, split the
    remaining budget between left and right with spill-over redistribution
    (tokenization.py:187-245 semantics at token granularity)."""
    m = mention_tokens[:mention_cap]
    budget = max_tokens - len(m) - 2  # [L]/[R] markers
    if budget < 0:
        budget = 0
    half = budget // 2
    take_l = min(len(left_tokens), half)
    take_r = min(len(right_tokens), budget - half)
    # redistribute whatever one side didn't use
    spare = budget - take_l - take_r
    if spare > 0 and len(left_tokens) > take_l:
        take_l = min(len(left_tokens), take_l + spare)
        spare = budget - take_l - take_r
    if spare > 0 and len(right_tokens) > take_r:
        take_r = min(len(right_tokens), take_r + spare)
    lefts = left_tokens[-take_l:] if take_l else []
    rights = right_tokens[:take_r] if take_r else []
    return lefts + ["[L]"] + m + ["[R]"] + rights
