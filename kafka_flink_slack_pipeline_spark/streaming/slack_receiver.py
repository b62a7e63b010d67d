"""Slack events HTTP receiver — the thin NON-ENGINE adapter (S5 edge).

The reference fronts its event pipeline with Bolt's ExpressReceiver
(`Slack Event Server/slackEventServer.js:8-16` — signing-secret
verification) plus an explicit URL-verification short-circuit
(`slackEventServer.js:21-26`: `type == 'url_verification'` → echo the
challenge with HTTP 200). SURVEY.md §2.1/S5 deliberately scopes the HTTP
listener OUT of the engine — events enter the engine as a
`readStream` + `from_json` topic — but the receiver lifecycle itself
(challenge handshake, request authentication, replay rejection) still
needs a home. This module is that home: pure, transport-injectable
functions a ~10-line Flask/stdlib HTTP shim can call, unit-testable with
no network. Whatever `receive()` accepts gets appended to the events
topic/landing dir the engine streams from.

Signature scheme (Slack's published v0 scheme, which Bolt implements
under the hood): sig = "v0=" + hex(HMAC_SHA256(signing_secret,
"v0:{timestamp}:{raw_body}")), rejected when |now - timestamp| exceeds
the replay window (5 minutes) or the digest mismatches
(constant-time compare).
"""

from __future__ import annotations

import hashlib
import hmac
import json
from dataclasses import dataclass

REPLAY_WINDOW_S = 300  # Slack's documented 5-minute replay guard


def compute_slack_signature(
    signing_secret: str, timestamp: str, body: str
) -> str:
    """The v0 signature Slack would send for (timestamp, raw body)."""
    base = f"v0:{timestamp}:{body}".encode()
    digest = hmac.new(
        signing_secret.encode(), base, hashlib.sha256
    ).hexdigest()
    return f"v0={digest}"


def verify_slack_signature(
    signing_secret: str,
    timestamp: str,
    body: str,
    signature: str,
    now: float,
) -> bool:
    """True iff the request authenticates: fresh timestamp (replay
    window) AND constant-time digest match. `now` is injected (no clock
    read here) so tests and callers control time explicitly."""
    try:
        ts = float(timestamp)
    except (TypeError, ValueError):
        return False
    if abs(now - ts) > REPLAY_WINDOW_S:
        return False
    expected = compute_slack_signature(signing_secret, timestamp, body)
    return hmac.compare_digest(expected, signature or "")


@dataclass(frozen=True)
class ReceiverResponse:
    status: int
    body: str
    event: dict | None  # event payload to append to the events topic


def receive(
    signing_secret: str,
    headers: dict[str, str],
    body: str,
    now: float,
) -> ReceiverResponse:
    """One POST /slack/events request → (HTTP response, optional event).

    Mirrors the reference receiver's three outcomes:
      - bad signature/stale timestamp → 401, nothing enqueued (Bolt's
        signing-secret gate, slackEventServer.js:8-16);
      - `url_verification` → 200 echoing the challenge string
        (slackEventServer.js:21-26);
      - anything else well-formed → 200 ack immediately (Slack requires
        a fast ack; `processBeforeResponse` notwithstanding) and the
        parsed payload handed back for the caller to append to the
        events topic the engine streams from.
    """
    sig_ok = verify_slack_signature(
        signing_secret,
        headers.get("x-slack-request-timestamp", ""),
        body,
        headers.get("x-slack-signature", ""),
        now,
    )
    if not sig_ok:
        return ReceiverResponse(401, "invalid signature", None)
    try:
        payload = json.loads(body)
    except json.JSONDecodeError:
        return ReceiverResponse(400, "malformed payload", None)
    if payload.get("type") == "url_verification":
        return ReceiverResponse(200, str(payload.get("challenge", "")), None)
    return ReceiverResponse(200, "", payload)
