"""robots.txt text parsing (T4 parity with master/src/crawler/robots_checker.py).

The reference fetches real robots.txt bytes and feeds them to
``urllib.robotparser`` (robots_checker.py:41-72), with the semantics:
HTTP 404 ⇒ allow-all, fetch error ⇒ allow-all, crawl-delay exposed.

Here the same contract is implemented for the engine: ``parse_robots_txt``
turns raw robots.txt text into the rules dict the scheduler consumes
({disallow_prefixes, crawl_delay_s}), honoring user-agent sections with
longest-match agent selection ('*' fallback) — the subset of REP the
reference's RobotFileParser actually exercises. ``render_robots_txt`` is
its inverse, used by the fixture so the engine parses real text rather
than structured rows (round-trip tested).
"""

from __future__ import annotations


def parse_robots_txt(text: str, user_agent: str = "WebCrawler") -> dict:
    """robots.txt text → {disallow_prefixes: [...], crawl_delay_s: float|None}.

    Groups of ``User-agent:`` lines introduce a record; the record applying
    to us is the most specific matching agent token ('*' = least specific).
    ``Disallow:`` with an empty value allows everything (ignored).
    """
    ua = user_agent.lower()
    records: list[tuple[list[str], dict]] = []
    agents: list[str] = []
    rules: dict = {"disallow_prefixes": [], "crawl_delay_s": None}
    in_record_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_record_body:
                records.append((agents, rules))
                agents, rules = [], {"disallow_prefixes": [], "crawl_delay_s": None}
                in_record_body = False
            agents.append(value.lower())
        elif field in ("disallow", "allow", "crawl-delay"):
            in_record_body = True
            if field == "disallow" and value:
                rules["disallow_prefixes"].append(value)
            elif field == "crawl-delay":
                try:
                    rules["crawl_delay_s"] = float(value)
                except ValueError:
                    pass
    if agents:
        records.append((agents, rules))

    best: dict | None = None
    best_len = -1
    for agent_list, r in records:
        for a in agent_list:
            if a == "*":
                match_len = 0
            elif a in ua or ua.startswith(a):
                match_len = len(a)
            else:
                continue
            if match_len > best_len:
                best_len = match_len
                best = r
    return best if best is not None else {"disallow_prefixes": [], "crawl_delay_s": None}


def render_robots_txt(rules: dict, user_agent: str = "*") -> str:
    """Inverse of ``parse_robots_txt`` for the fixture's per-host rules."""
    lines = [f"User-agent: {user_agent}"]
    for p in rules.get("disallow_prefixes") or []:
        lines.append(f"Disallow: {p}")
    delay = rules.get("crawl_delay_s")
    if delay:
        lines.append(f"Crawl-delay: {delay}")
    if len(lines) == 1:
        lines.append("Disallow:")
    return "\n".join(lines) + "\n"


def rules_for_host(host: str, robots_text: str | None, fetch_status: int,
                   user_agent: str = "WebCrawler") -> dict:
    """Full reference semantics: 404 or fetch error ⇒ allow-all
    (robots_checker.py:55-58,66-72); 200 ⇒ parse the text."""
    if fetch_status != 200 or robots_text is None:
        return {"host": host, "disallow_prefixes": [], "crawl_delay_s": None,
                "fetch_status": fetch_status}
    parsed = parse_robots_txt(robots_text, user_agent)
    return {"host": host, "fetch_status": 200, **parsed}
