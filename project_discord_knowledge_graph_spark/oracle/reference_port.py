"""Behavioral port of the reference rule path (test oracle only).

Each function reproduces the observable semantics of one reference
stage, written from the behavioral spec in SURVEY.md section 2 (with
file:line citations below).  It runs single-threaded eager Python and
is used exclusively by the test suite to check the Spark pipeline's
output triple set.

Semantics sources in /root/reference:
- clean_text (preprocessor variant): preprocessing/preprocessor.py:119-138
- clean_text (classifier variant):   preprocessing/classifier.py:65-82
- segment id:                        preprocessing/preprocessor.py:140-166
- rule classifier:                   extraction/llm_powered/nodes.py:149-268
- per-type triple extraction:        extraction/rule_based/extractor.py:81-383
- Q&A linking (reply/mention):       extraction/rule_based/extractor.py:441-492
- dedup + validation:                extraction/llm_powered/nodes.py:644-691
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import re
from typing import Any

from .. import config as C

_FLAGS = re.IGNORECASE


def _search_any(patterns, text: str) -> bool:
    return any(re.search(p, text, _FLAGS) for p in patterns)


# ---------------------------------------------------------------------------
# Cleaners (two distinct variants — never unify; SURVEY section 7)
# ---------------------------------------------------------------------------

def clean_text_preprocessor(text: str) -> str:
    """P3 — preprocessor.py:119-138."""
    if not text:
        return ""
    s = text.lower()
    s = re.sub(r"\n\s*\n\s*\n+", "\n\n", s)
    s = re.sub(r"[ \t]+", " ", s)
    s = s.strip()
    s = re.sub(r"<@!?(\d+)>", r"@user\1", s)
    s = re.sub(r"<#(\d+)>", r"#channel\1", s)
    s = re.sub(r"<@&(\d+)>", r"@role\1", s)
    s = re.sub(r"<:(\w+):\d+>", r":\1:", s)
    return s


def clean_text_classifier(text: str) -> str:
    """P4 — classifier.py:65-82 (a deliberately different cleaner)."""
    if not text:
        return ""
    s = text.lower()
    s = re.sub(r"\s+", " ", s)
    s = s.strip()
    s = re.sub(r"<@!?\d+>", "[mention]", s)
    s = re.sub(r"<#\d+>", "[channel]", s)
    s = re.sub(r"<:\w+:\d+>", "[emoji]", s)
    return s


def normalize_timestamp(timestamp_str: str | None) -> str | None:
    """P2 — preprocessor.py:98-117.  The reference substitutes
    datetime.now(utc) for empty/unparseable inputs; that wall-clock
    read is nondeterministic, so the port returns None for those rows
    (documented deviation, SURVEY section 7 — the engine quarantines
    them instead)."""
    if not timestamp_str:
        return None
    try:
        if timestamp_str.endswith("Z"):
            d = _dt.datetime.fromisoformat(
                timestamp_str.replace("Z", "+00:00"))
        elif "+" in timestamp_str or "-" in timestamp_str[-6:]:
            d = _dt.datetime.fromisoformat(timestamp_str)
        else:
            d = _dt.datetime.fromisoformat(timestamp_str).replace(
                tzinfo=_dt.timezone.utc)
        return d.astimezone(_dt.timezone.utc).isoformat()
    except Exception:
        return None


def segment_id(thread_name: str | None, channel: str, author: str,
               timestamp: str) -> str:
    """preprocessor.py:140-166 — thread slug or md5 of hour bucket."""
    if thread_name:
        return "thread-" + re.sub(r"[^a-zA-Z0-9]", "-", thread_name.lower())
    try:
        dt = _dt.datetime.fromisoformat(timestamp.replace("Z", "+00:00"))
        window = dt.strftime("%Y%m%d-%H")
    except Exception:
        window = "unknown"
    key = f"{channel}-{author}-{window}"
    return "segment-" + hashlib.md5(key.encode()).hexdigest()[:8]


# ---------------------------------------------------------------------------
# C1 rule classifier (nodes.py:195-226 precedence)
# ---------------------------------------------------------------------------

def extract_thread_name(message: dict) -> str | None:
    """preprocessor.py:168-185."""
    if message.get("thread"):
        t = message["thread"]
        return t.get("name") if isinstance(t, dict) else str(t)
    ref = message.get("reference")
    if ref and isinstance(ref, dict) and "channelId" in ref:
        return f"thread-{ref['channelId']}"
    return None


def preserve_metadata(message: dict) -> dict:
    """preprocessor.py:47-96 — every .get default reproduced."""
    author = message.get("author", {})
    roles = [r.get("name", "") if isinstance(r, dict) else str(r)
             for r in author.get("roles", [])]
    mentions = [m.get("name", m.get("id", "")) if isinstance(m, dict)
                else str(m) for m in message.get("mentions", [])]
    attachments = [{"filename": a.get("fileName", ""),
                    "url": a.get("url", ""),
                    "size": a.get("fileSizeBytes", 0)}
                   for a in message.get("attachments", [])
                   if isinstance(a, dict)]
    reactions = [{"emoji": r.get("emoji", {}).get("name", ""),
                  "count": r.get("count", 0)}
                 for r in message.get("reactions", [])
                 if isinstance(r, dict)]
    return {
        "original_timestamp": message.get("timestamp", ""),
        "author_id": author.get("id", ""),
        "author_roles": roles,
        "mentions": mentions,
        "attachments": attachments,
        "reactions": reactions,
        "is_bot": author.get("isBot", False),
        "is_pinned": message.get("isPinned", False),
        "reply_to": (message.get("reference", {}).get("messageId")
                     if message.get("reference") else None),
    }


def process_export(data: dict) -> list[dict]:
    """preprocessor.py:252-283 + process_message (213-250), minus the
    classifier stage (type/confidence keep the 'alert'/0.5 defaults)
    and with the normalize_timestamp now() fallback as None (same
    documented deviation as normalize_timestamp above)."""
    channel = data.get("channel", {}).get("name", "unknown")
    out = []
    for message in data.get("messages", []):
        if not message.get("content", "").strip():
            continue
        author = message.get("author", {}).get("name", "unknown")
        raw_ts = message.get("timestamp", "")
        thread = extract_thread_name(message)
        # NOTE the reference's segment grouping reads the channel from
        # the MESSAGE (group_messages_by_segments, preprocessor.py:196)
        # — which standard exports don't carry, so the hash key uses
        # 'unknown' — while the emitted channel column carries the
        # export's top-level channel name (process_discord_export,
        # preprocessor.py:259,278).  Reproduced faithfully.
        seg_channel = message.get("channel", {}).get("name", "unknown")
        out.append({
            "message_id": message.get("id", ""),
            "segment_id": segment_id(thread, seg_channel, author, raw_ts),
            "thread": thread,
            "channel": channel,
            "author": author,
            "timestamp": normalize_timestamp(raw_ts),
            "type": "alert",
            "confidence": 0.5,
            "content": message.get("content", ""),
            "clean_text": clean_text_preprocessor(
                message.get("content", "")),
            **preserve_metadata(message),
        })
    return out


def classify(clean_text: str) -> str:
    text = clean_text.lower()
    if re.search(C.PERFORMANCE_PATTERN, text) and re.search(
            C.RETURN_KEYWORDS, text, _FLAGS):
        return "performance"
    if _search_any(C.CLASSIFIER_ALERT_PATTERNS, text):
        return "alert"
    if _search_any(C.CLASSIFIER_QUESTION_PATTERNS, text):
        return "question"
    if _search_any(C.CLASSIFIER_STRATEGY_PATTERNS, text):
        return "strategy"
    if _search_any(C.CLASSIFIER_ANALYSIS_PATTERNS, text):
        return "analysis"
    if len(text) > 50 and not text.endswith("?"):
        return "answer"
    return "discussion"


# ---------------------------------------------------------------------------
# Per-type triple extraction (extractor.py:81-383)
# A triple is a plain dict with keys
# subject predicate object message_id segment_id timestamp confidence.
# ---------------------------------------------------------------------------

def _mk(subj, pred, obj, msg, conf) -> dict[str, Any]:
    return {
        "subject": subj, "predicate": pred, "object": obj,
        "message_id": msg["message_id"], "segment_id": msg["segment_id"],
        "timestamp": msg["timestamp"], "confidence": conf,
    }


def _trunc(text: str, n: int) -> str:
    return text[:n] + "..." if len(text) > n else text


def _assets(content: str) -> list[str]:
    found: list[str] = []
    for key in ("crypto", "etf", "stock"):
        found.extend(re.findall(C.ASSET_PATTERNS[key], content, _FLAGS))
    # reference uses list(set(...)) — order nondeterministic; sort here
    # (parity is defined on the triple *set*, SURVEY section 7)
    return sorted({a.upper() for a in found})


def _actions(content: str) -> list[str]:
    return [a for a in C.ACTION_ORDER
            if re.search(C.ACTION_PATTERNS[a], content, _FLAGS)]


def extract_question(msg) -> list[dict]:
    content = msg["clean_text"]
    if not (_search_any(C.QUESTION_INDICATORS, content)
            or msg["type"] == "question"):
        return []
    topic = re.sub(C.QUESTION_TOPIC_STRIP, "", content, flags=_FLAGS).strip()
    if len(topic) > C.TRUNC_TOPIC:
        topic = topic[:C.TRUNC_TOPIC] + "..."
    if not topic.strip():
        topic = _trunc(content, C.TRUNC_SNIPPET)
    return [_mk(msg["author"], "asks_about", topic, msg, C.CONF_ASKS_ABOUT)]


def extract_answer(msg) -> list[dict]:
    if msg["type"] != "answer":
        return []
    obj = _trunc(msg["clean_text"], C.TRUNC_SNIPPET)
    return [_mk(msg["author"], "provides_info", obj, msg,
                C.CONF_PROVIDES_INFO)]


def extract_alert(msg) -> list[dict]:
    content = msg["clean_text"]
    if not (_search_any(C.ALERT_INDICATORS, content)
            or msg["type"] == "alert"):
        return []
    obj = "all_members about " + _trunc(content, C.TRUNC_SNIPPET)
    return [_mk(msg["author"], "alerts", obj, msg, C.CONF_ALERTS)]


def extract_strategy(msg) -> list[dict]:
    content = msg["clean_text"]
    out = [_mk(msg["author"], "recommends", f"{s.lower()} strategy", msg,
               C.CONF_RECOMMENDS)
           for s in re.findall(C.STRATEGY_PATTERN, content, _FLAGS)]
    if msg["type"] == "strategy" and not out:
        out.append(_mk(msg["author"], "discusses_strategy",
                       _trunc(content, C.TRUNC_STRATEGY), msg,
                       C.CONF_DISCUSSES_STRATEGY))
    return out


def extract_signal(msg) -> list[dict]:
    content = msg["clean_text"]
    assets, actions = _assets(content), _actions(content)
    out = [_mk(msg["author"], f"recommends_{act}", asset, msg, C.CONF_SIGNAL)
           for asset in assets for act in actions]
    if assets and not actions:
        out = [_mk(msg["author"], "mentions_asset", asset, msg,
                   C.CONF_MENTIONS_ASSET) for asset in assets]
    return out


def extract_performance(msg) -> list[dict]:
    content = msg["clean_text"]
    pcts = re.findall(C.PERFORMANCE_PATTERN, content)
    if not (pcts and re.search(C.RETURN_KEYWORDS, content, _FLAGS)):
        return []
    out = []
    for pct in pcts:
        obj = (f"{pct}% loss on strategy" if pct.startswith("-")
               else f"+{pct}% on strategy")
        out.append(_mk(msg["author"], "reports_return", obj, msg,
                       C.CONF_REPORTS_RETURN))
    return out


def extract_analysis(msg) -> list[dict]:
    content = msg["clean_text"]
    if not (_search_any(C.ANALYSIS_INDICATORS, content)
            or msg["type"] == "analysis"):
        return []
    assets = _assets(content)
    if assets:
        return [_mk(msg["author"], "analyzes", f"{a} outlook", msg,
                    C.CONF_ANALYZES) for a in assets]
    return [_mk(msg["author"], "provides_analysis",
                _trunc(content, C.TRUNC_SNIPPET), msg,
                C.CONF_PROVIDES_ANALYSIS)]


def extract_discussion(msg) -> list[dict]:
    if msg["type"] != "discussion":
        return []
    content = msg["clean_text"]
    out = [_mk(msg["author"], "discusses", p.lower(), msg, C.CONF_DISCUSSES)
           for p in re.findall(C.PLATFORM_PATTERN, content, _FLAGS)]
    out += [_mk(msg["author"], "shares_opinion", f"on {a}", msg,
                C.CONF_SHARES_OPINION) for a in _assets(content)]
    return out


_STRATEGIES = {
    "question": extract_question,
    "answer": extract_answer,
    "alert": extract_alert,
    "strategy": extract_strategy,
    "signal": extract_signal,
    "performance": extract_performance,
    "analysis": extract_analysis,
    "discussion": extract_discussion,
}


def extract_all(messages: list[dict]) -> list[dict]:
    """E9 dispatch (extractor.py:565-593): per-type extraction then
    Q&A links, in encounter order."""
    triples: list[dict] = []
    for msg in messages:
        fn = _STRATEGIES.get(msg.get("type", "unknown"))
        if fn:
            triples.extend(fn(msg))
    triples.extend(link_qa(messages))
    return triples


# ---------------------------------------------------------------------------
# Q&A linking, reply + mention strategies (extractor.py:398-492).
# The semantic strategy (J3) is inactive in the reference when
# sentence-transformers is absent — the parity path excludes it.
# ---------------------------------------------------------------------------

def _ts(s: str) -> _dt.datetime:
    return _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))


def link_qa(messages: list[dict],
            time_window_minutes: int = C.QA_TIME_WINDOW_MINUTES) -> list[dict]:
    by_segment: dict[str, list[dict]] = {}
    for m in messages:
        by_segment.setdefault(m["segment_id"], []).append(m)

    triples: list[dict] = []
    for seg_msgs in by_segment.values():
        seg_msgs = sorted(seg_msgs, key=lambda m: m["timestamp"])
        questions = [m for m in seg_msgs if m["type"] == "question"]
        answers = [m for m in seg_msgs if m["type"] == "answer"]
        if not questions or not answers:
            continue

        # reply strategy: first matching question wins (extractor.py:441-463)
        for a in answers:
            if not a.get("reply_to"):
                continue
            for q in questions:
                if q["message_id"] == a["reply_to"]:
                    triples.append({
                        "subject": q["message_id"],
                        "predicate": "answered_by",
                        "object": a["message_id"],
                        "message_id":
                            f"{q['message_id']}_reply_{a['message_id']}",
                        "segment_id": q["segment_id"],
                        "timestamp": a["timestamp"],
                        "confidence": C.CONF_LINK_REPLY,
                    })
                    break

        # mention strategy: every matching (mention, question) pair within
        # the window links (extractor.py:465-492).  NB: the reference
        # checks only (a_ts - q_ts) <= window, so an answer *before* the
        # question also links (negative difference passes).
        for a in answers:
            a_time = _ts(a["timestamp"])
            for mention in a.get("mentions") or []:
                for q in questions:
                    if q["author"].lower() != mention.lower():
                        continue
                    delta = (a_time - _ts(q["timestamp"])).total_seconds()
                    if delta <= time_window_minutes * 60:
                        triples.append({
                            "subject": q["message_id"],
                            "predicate": "answered_by",
                            "object": a["message_id"],
                            "message_id":
                                f"{q['message_id']}_mention_{a['message_id']}",
                            "segment_id": q["segment_id"],
                            "timestamp": a["timestamp"],
                            "confidence": C.CONF_LINK_MENTION,
                        })
    return triples


# ---------------------------------------------------------------------------
# Dedup + validation (nodes.py:644-691)
# ---------------------------------------------------------------------------

def dedup_and_validate(triples: list[dict]) -> list[dict]:
    seen: set[str] = set()
    out: list[dict] = []
    for t in triples:
        key = f"{t['subject']}|{t['predicate']}|{t['object']}".lower().strip()
        if key in seen:
            continue
        seen.add(key)
        if not (t["subject"] and t["predicate"] and t["object"]):
            continue
        conf = t["confidence"]
        if not 0.0 <= conf <= 1.0:
            conf = 0.5
        t = dict(t, subject=str(t["subject"]).strip(),
                 predicate=str(t["predicate"]).strip(),
                 object=str(t["object"]).strip(), confidence=conf)
        if len(t["object"]) < C.MIN_OBJECT_LEN:
            continue
        out.append(t)
    return out


def preprocess(raw_messages: list[dict]) -> list[dict]:
    """Preprocess raw messages the way the reference pipeline does:
    drop empties (preprocessor.py:272-274), clean (P3), derive
    segment_id, classify (C1)."""
    out = []
    for m in raw_messages:
        if not m.get("content", "").strip():
            continue
        ct = clean_text_preprocessor(m["content"])
        mm = dict(
            m,
            clean_text=ct,
            segment_id=segment_id(m.get("thread"), m["channel"],
                                  m["author"], m["timestamp"]),
        )
        mm["type"] = classify(ct)
        out.append(mm)
    return out


def run_pipeline(messages: list[dict]) -> list[dict]:
    """Full reference rule path: extract -> link -> dedup -> validate."""
    return dedup_and_validate(extract_all(messages))


def run_from_raw(raw_messages: list[dict]) -> list[dict]:
    """Raw messages (ISO timestamps) -> final validated triples."""
    return run_pipeline(preprocess(raw_messages))
