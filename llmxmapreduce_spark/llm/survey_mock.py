"""Deterministic mock LLM for the V2 survey pipeline (FIXTURES.md A9).

Routes on the stage markers embedded in pipelines/v2_survey.py's prompts and
behaves like a *cooperative* model: outlines are built from the bibkeys it
is shown, digests echo the outline structure (so J1 alignment genuinely
passes/fails on structure), modifications tweak descriptions only, and eval
scores are prompt-hash-derived — every run is bit-identical.
"""

from __future__ import annotations

import hashlib
import re

from llmxmapreduce_spark.llm.client import HashEchoClient, LLMClient

_BIBKEY_RE = re.compile(r"Bibkey: '([^']+)'")
_HEADING_RE = re.compile(r"^## (.+)$", re.MULTILINE)
_TITLE_RE = re.compile(r"Survey title: (.+)")
_PAPER_KEY_RE = re.compile(r"Paper bibkey: ([\w-]+)")
# merged digest material (digest_ops.MERGE format): "Paper bibkey: [<key>]"
_MERGED_KEY_RE = re.compile(r"Paper bibkey: \[([\w-]+)\]")
_SECTION_RE = re.compile(r"Section title: (.+)")
_FENCED_RE = re.compile(r"```markdown\n(.*?)\n```", re.DOTALL)
_SUGG_RE = re.compile(r"```suggestion\n(.*?)\n```", re.DOTALL)


def _h(s: str, n: int = 8) -> str:
    return hashlib.md5(s.encode()).hexdigest()[:n]


class MockSurveyClient(LLMClient):
    def complete(self, prompt: str) -> str:  # noqa: C901 - routing table
        if "[INIT_OUTLINE]" in prompt:
            title = (_TITLE_RE.search(prompt) or [None, "Untitled"])[1].strip()
            keys = sorted(set(_BIBKEY_RE.findall(prompt)))
            lines = [f"# {title}"]
            for k in keys[:4]:
                lines.append(f"## Studies of {k}")
                lines.append(f"Covers the work of {k}.")
            return "```markdown\n" + "\n".join(lines) + "\n```"

        if "[CONCAT_OUTLINE]" in prompt:
            title = (_TITLE_RE.search(prompt) or [None, "Untitled"])[1].strip()
            sections = sorted(set(_HEADING_RE.findall(prompt)))
            lines = [f"# {title}"]
            for s in sections:
                lines.append(f"## {s}")
                lines.append(f"Merged coverage of {s}.")
            return "```markdown\n" + "\n".join(lines) + "\n```"

        if "[DIGEST]" in prompt:
            key = (_PAPER_KEY_RE.search(prompt) or [None, "unknown"])[1]
            outline = _FENCED_RE.search(prompt)
            body = outline.group(1) if outline else "# Digest"
            lines = []
            for line in body.split("\n"):
                m = re.match(r"^(#+)\s+(.*)$", line)
                if m:
                    lines.append(line)
                    if len(m.group(1)) > 1:
                        lines.append(f"Extract for {m.group(2)} from [{key}].")
            out = "\n".join(lines)
            return (f"```markdown\n{out}\n```\n"
                    f"```suggestion\nCover {key} more deeply.\n```")

        if "[FEEDBACK]" in prompt or "[KERNEL]" in prompt:
            return f"```suggestion\nEmphasize theme {_h(prompt)}.\n```"

        if "[MODIFY]" in prompt:
            outline = _FENCED_RE.search(prompt)
            sugg = _SUGG_RE.search(prompt)
            body = outline.group(1) if outline else "# Untitled"
            tag = _h(sugg.group(1) if sugg else prompt, 6)
            lines = list(body.split("\n"))
            lines.append(f"Revision note {tag}.")
            return "```markdown\n" + "\n".join(lines) + "\n```"

        if "[EVAL_OUTLINE]" in prompt:
            score = (int(_h(prompt), 16) % 101) / 10.0
            return f"Assessment.\n<SCORE>{score}</SCORE>"

        if "[SELF_REFINE]" in prompt:
            return f"```suggestion\nTighten structure {_h(prompt, 6)}.\n```"

        if "[ORCHESTRA]" in prompt or "[SUMMARY]" in prompt:
            section = (_SECTION_RE.search(prompt) or [None, "Section"])[1].strip()
            keys = sorted(set(_MERGED_KEY_RE.findall(prompt))
                          or set(_PAPER_KEY_RE.findall(prompt)))[:3]
            cites = " ".join(f"[{k}]" for k in keys) if keys else ""
            return f"Generated prose for {section}. {cites}".strip()

        if "[FIGURES]" in prompt:
            m = re.search(r"^## (.+)$\n(.+)$", prompt.split("Content:\n", 1)[-1],
                          re.MULTILINE)
            if not m:
                return "No figures."
            section, first_line = m.group(1).strip(), m.group(2).strip()
            anchor = first_line[:25]
            return (
                f"Section Title: {section}\n"
                f"Position Sentence: {anchor}\n"
                f"Figure Title: Overview of {section}\n"
                "```mermaid\ngraph TD;\nA-->B\n```"
            )

        if "[GROUP]" in prompt:
            # cluster consecutive pairs of the listed bibkeys, leave the last
            # key ungrouped when odd (exercises the regroup repair pass)
            keys = re.findall(r"- ([\w-]+)$", prompt, re.MULTILINE)
            groups = ["[" + ", ".join(keys[i:i + 2]) + "]"
                      for i in range(0, len(keys) - 1, 2)]
            return "Grouping:\n" + "\n".join(groups)

        if "[TOPIC_EXPANSION]" in prompt:
            topic = (_TITLE_RE.search(prompt) or [None, "topic"])[1].strip()
            return (f"Expanded framing of {topic}: scope, methods, "
                    f"applications, and open problems of {topic}.")

        if "[ABSTRACT_GEN]" in prompt:
            body = prompt.split("Content:\n", 1)[-1].strip()
            return "Abstract: " + body[:150]

        if "[QUERY_EXPAND]" in prompt:
            topic = (_TITLE_RE.search(prompt) or [None, "topic"])[1].strip()
            qs = "; ".join(f"{topic} {suffix}"
                           for suffix in ("survey", "methods", "benchmarks"))
            return f"```markdown\n{qs}\n```"

        if "[SNIPPET_SCORE]" in prompt or "[SIMILARITY]" in prompt:
            return f"relevance analysis\n<SCORE>{int(_h(prompt), 16) % 101}</SCORE>"

        if "[PAGE_REFINE]" in prompt:
            raw = prompt.split("Page:\n", 1)[-1]
            first = raw.strip().split("\n", 1)[0].lstrip("# ")[:60] or "Untitled"
            return (f"<TITLE>{first}</TITLE>\n"
                    f"<CONTENT>{raw.strip()[:2000]}</CONTENT>")

        if "[NLI]" in prompt:
            # cooperative NLI: supported iff the claim shares a rare token
            # with the source (deterministic, content-sensitive)
            src = prompt.split("Source:\n", 1)[-1].split("\nClaim:", 1)[0]
            claim = prompt.split("Claim:\n", 1)[-1]
            src_toks = {t for t in re.findall(r"[a-z]{6,}", src.lower())}
            hit = any(t in src_toks for t in re.findall(r"[a-z]{6,}", claim.lower()))
            return "Yes, the source supports the claim." if hit else "No."

        if "[CRITERIA]" in prompt:
            return f"Justification.\nScore: {1 + int(_h(prompt), 16) % 5}"

        if "[SECTION_SCORE]" in prompt:
            return f"analysis\n<SCORE>{int(_h(prompt), 16) % 101}</SCORE>"

        if "[POLISH]" in prompt:
            body = prompt.split("Draft:\n", 1)[-1]
            return body.strip()

        return HashEchoClient().complete(prompt)


class RestructuringSurveyClient(MockSurveyClient):
    """Mock whose [MODIFY] *restructures* the outline: it inserts a new
    top-level section right under the root.  Exercises the block cycle
    (hidden_pipeline.py:73-85): after refinement the preorder positions of
    every section shift, so decode is only correct if digests were
    regenerated against the refined outline — with single-shot digestion the
    old pos-keyed join would land material in the wrong sections.
    Idempotent (inserts once), so repeated modify calls keep the structure
    stable within a cycle."""

    SECTION = "Emergent Topics"

    def complete(self, prompt: str) -> str:
        if "[MODIFY]" in prompt:
            outline = _FENCED_RE.search(prompt)
            body = outline.group(1) if outline else "# Untitled"
            if self.SECTION in body:
                return "```markdown\n" + body + "\n```"
            lines = body.split("\n")
            lines[1:1] = [f"## {self.SECTION}", "Cross-cutting new directions."]
            return "```markdown\n" + "\n".join(lines) + "\n```"
        return super().complete(prompt)
