"""Slack receiver thin adapter (S5 edge): URL-verification challenge echo
+ v0 signing-secret verification + replay-window rejection — the
reference's ExpressReceiver lifecycle (slackEventServer.js:8-26) as pure
injectable functions. No Spark, no network."""

from __future__ import annotations

import json

from kafka_flink_slack_pipeline_spark.streaming.slack_receiver import (
    REPLAY_WINDOW_S,
    compute_slack_signature,
    receive,
    verify_slack_signature,
)

SECRET = "8f742231b10e8888abcd99yyyzzz85a5"
NOW = 1_531_420_618.0


def _headers(ts: str, body: str, secret: str = SECRET) -> dict[str, str]:
    return {
        "x-slack-request-timestamp": ts,
        "x-slack-signature": compute_slack_signature(secret, ts, body),
    }


def test_signature_shape_and_roundtrip():
    """v0 scheme structure: 'v0=' + 64 lowercase hex chars of
    HMAC-SHA256 over 'v0:{ts}:{body}', deterministic, and accepted by
    the verifier it pairs with."""
    body = "payload=x"
    ts = "1531420618"
    sig = compute_slack_signature(SECRET, ts, body)
    assert sig.startswith("v0=") and len(sig) == 3 + 64
    assert sig == compute_slack_signature(SECRET, ts, body)
    # pinned golden (self-consistent vector; guards accidental scheme
    # drift — base-string format, digest algo, hex case)
    import hashlib
    import hmac as hmac_mod

    expected = hmac_mod.new(
        SECRET.encode(), f"v0:{ts}:{body}".encode(), hashlib.sha256
    ).hexdigest()
    assert sig == f"v0={expected}"
    assert verify_slack_signature(SECRET, ts, body, sig, NOW)


def test_signature_rejections():
    body = '{"type":"event_callback"}'
    ts = str(int(NOW))
    good = compute_slack_signature(SECRET, ts, body)
    # wrong secret
    assert not verify_slack_signature("other", ts, body, good, NOW)
    # tampered body
    assert not verify_slack_signature(SECRET, ts, body + "x", good, NOW)
    # stale timestamp (replay) — and a fresh one just inside the window
    old = str(int(NOW) - REPLAY_WINDOW_S - 1)
    assert not verify_slack_signature(
        SECRET, old, body, compute_slack_signature(SECRET, old, body), NOW
    )
    edge = str(int(NOW) - REPLAY_WINDOW_S + 1)
    assert verify_slack_signature(
        SECRET, edge, body, compute_slack_signature(SECRET, edge, body), NOW
    )
    # garbage timestamp / missing signature
    assert not verify_slack_signature(SECRET, "not-a-ts", body, good, NOW)
    assert not verify_slack_signature(SECRET, ts, body, None, NOW)


def test_url_verification_challenge_echo():
    # slackEventServer.js:21-26 — echo the challenge with HTTP 200
    body = json.dumps(
        {"type": "url_verification", "challenge": "3eZbrw1aBm2rZgRNFdxV2595"}
    )
    ts = str(int(NOW))
    resp = receive(SECRET, _headers(ts, body), body, NOW)
    assert (resp.status, resp.body) == (200, "3eZbrw1aBm2rZgRNFdxV2595")
    assert resp.event is None  # handshake is not an event


def test_event_callback_acked_and_enqueued():
    payload = {
        "type": "event_callback",
        "event": {"type": "app_mention", "channel": "C1", "ts": "1.2",
                  "user": "U1", "text": "<@B1> hello"},
    }
    body = json.dumps(payload)
    ts = str(int(NOW))
    resp = receive(SECRET, _headers(ts, body), body, NOW)
    assert resp.status == 200
    assert resp.event == payload  # handed to the events-topic appender


def test_unsigned_request_never_enqueues():
    body = json.dumps({"type": "event_callback", "event": {}})
    ts = str(int(NOW))
    resp = receive(
        SECRET,
        {"x-slack-request-timestamp": ts, "x-slack-signature": "v0=bad"},
        body,
        NOW,
    )
    assert (resp.status, resp.event) == (401, None)
    # signed but malformed JSON → 400, nothing enqueued
    bad = "{not json"
    resp2 = receive(SECRET, _headers(ts, bad), bad, NOW)
    assert (resp2.status, resp2.event) == (400, None)
