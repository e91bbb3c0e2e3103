"""Token budgeting for reasoning prompts (reference: hippocampal_memory.py:
2064-2153, 2574-2621 — even-spaced subsampling into a 120k context).

Same behavior: keep first/middle/last items, evenly spaced, and append a
"[Note: Showing X of Y]" marker when subsampled.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from hippomm_tpu.utils.tokens import count_tokens


def evenly_spaced_indices(n: int, k: int) -> List[int]:
    """k indices over range(n), always including 0 and n-1."""
    if k >= n:
        return list(range(n))
    if k <= 1:
        return [0]
    step = (n - 1) / (k - 1)
    idx = sorted({round(i * step) for i in range(k)})
    return [min(i, n - 1) for i in idx]


def evenly_distribute_items(
    items: Sequence[str], max_tokens: int, item_format: str = "{}"
) -> Tuple[List[str], bool]:
    """Subsample items until the formatted total fits max_tokens.

    Returns (kept_items, was_subsampled). (reference: evenly_distribute_captions
    :2064-2107 / evenly_distribute_transcriptions :2574-2621)."""
    items = list(items)
    if not items:
        return [], False
    total = sum(count_tokens(item_format.format(s)) for s in items)
    if total <= max_tokens:
        return items, False
    avg = max(1, total // len(items))
    k = max(1, max_tokens // avg)
    idx = evenly_spaced_indices(len(items), k)
    kept = [items[i] for i in idx]
    # trim further if the estimate undershot
    while len(kept) > 1 and sum(count_tokens(item_format.format(s)) for s in kept) > max_tokens:
        idx = evenly_spaced_indices(len(kept), max(1, len(kept) // 2))
        kept = [kept[i] for i in idx]
    return kept, True


def truncate_text_to_tokens(text: str, max_tokens: int) -> str:
    """Head+tail truncation of one long text (reference:
    evenly_distribute_transcription :2109-2153)."""
    if count_tokens(text) <= max_tokens:
        return text
    words = text.split()
    keep = max(2, int(len(words) * max_tokens / max(1, count_tokens(text))))
    head = words[: keep // 2]
    tail = words[-(keep - keep // 2) :]
    return " ".join(head) + " […] " + " ".join(tail)


def proportional_split(total: int, weights: Sequence[float]) -> List[int]:
    """Split a token budget proportionally (reference VIDEO+AUDIO split
    :1977-2004)."""
    s = sum(weights) or 1.0
    return [max(1, int(total * w / s)) for w in weights]


def subsample_note(shown: int, total: int) -> str:
    return f"[Note: Showing {shown} of {total} items]" if shown < total else ""
