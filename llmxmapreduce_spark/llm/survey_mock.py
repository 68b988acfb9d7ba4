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
# title: condensed "Survey title: X" or the reference phrasings
# ('…on the topic "X"', '…survey topic is "X"', '…survey titled "X"')
_TITLE_RE = re.compile(r"Survey title: (.+)")
_REF_TITLE_RE = re.compile(r'(?:topic(?: is)?|titled|survey on the \*\*topic\*\*) "([^"\n]+)"')
# search templates embed the topic unquoted: 'on the topic of {topic}.' /
# "related to '{topic}'"
_REF_TOPIC_RE = re.compile(r"(?:on the topic of|related to ')([^.'\n]+)")
_PAPER_KEY_RE = re.compile(r"Paper bibkey: ([\w-]+)")
# reference SINGLE_DIGEST: "## Bibkey of the Reference Paper\n['<key>']"
_REF_PAPER_KEY_RE = re.compile(r"Bibkey of the Reference Paper\n\['([^']+)'\]")
# merged digest material (digest_ops.MERGE format): "Paper bibkey: [<key>]"
_MERGED_KEY_RE = re.compile(r"Paper bibkey: \[([\w-]+)\]")
_SECTION_RE = re.compile(r"Section title: (.+)")
# reference ORCHESTRA/SUMMARY embed {section_title} as the first line of the
# Format Example fence
_REF_SECTION_RE = re.compile(r"Format Example:\s*\n```markdown\n(.+)")
_FENCED_RE = re.compile(r"```markdown\n(.*?)\n```", re.DOTALL)
_SUGG_RE = re.compile(r"```suggestion\n(.*?)\n```", re.DOTALL)
# the reference templates label the outline-under-edit "Initial Skeleton" /
# "**Skeleton**: " and put Format Example fences BEFORE it — prefer the
# labeled fence, fall back to the first fence (condensed prompts)
_SKELETON_FENCE_RE = re.compile(
    r"Skeleton\*{0,2}:?\s*\n```markdown\n(.*?)\n```", re.DOTALL)


def _outline_in(prompt: str):
    return _SKELETON_FENCE_RE.search(prompt) or _FENCED_RE.search(prompt)

# Routing markers for the FULL reference prompts (prompts/prompts_en.py):
# one static sentence unique to each template, mapped to the same condensed
# tag the pipeline's short prompts carry — so the mock drives both modes.
_REF_MARKERS = {
    "YOUR TASK is to construct the outline of the survey": "[INIT_OUTLINE]",
    "Given that there may be overlaps and conflicts among the outlines": "[CONCAT_OUTLINE]",
    "supporting researchers in efficiently synthesizing relevant research": "[DIGEST]",
    "The final goal is to build up a comprehensive and critical domain analysis framework": "[FEEDBACK]",
    "To integrate the group of suggestions, please follow these principles:": "[KERNEL]",
    "Given the initial outline and the modification suggestions": "[MODIFY]",
    "Based on provided outline initial outline and modify suggestions": "[MODIFY]",
    "The outline entropy consists of two components:": "[EVAL_OUTLINE]",
    "To provide effective suggestions for refining the initial outline": "[SELF_REFINE]",
    "helping researchers efficiently synthesize relevant research": "[ORCHESTRA]",
    "with expertise in literature reviews, dedicated to": "[SUMMARY]",
    "Convert multiple consecutive references to this form": "[POLISH]",
    "Group all the provided papers in an objective and logical manner": "[GROUP]",
    # search/crawl templates (LLM_search.py / async_crawl.py)
    "Please generate a set of search queries": "[QUERY_EXPAND]",
    "Please infer the degree of relevance between this web page and the topic": "[SNIPPET_SCORE]",
    "Evaluate the quality of the following content retrieved from the internet": "[SIMILARITY]",
    "Original web page content:": "[PAGE_REFINE]",
}


def _tagged(prompt: str, tag: str) -> bool:
    if tag in prompt:
        return True
    return any(t == tag and m in prompt for m, t in _REF_MARKERS.items())


def _title(prompt: str) -> str:
    m = (_TITLE_RE.search(prompt) or _REF_TITLE_RE.search(prompt)
         or _REF_TOPIC_RE.search(prompt))
    return m.group(1).strip() if m else "Untitled"


def _section(prompt: str) -> str:
    m = _SECTION_RE.search(prompt) or _REF_SECTION_RE.search(prompt)
    return m.group(1).strip() if m else "Section"


def _h(s: str, n: int = 8) -> str:
    return hashlib.md5(s.encode()).hexdigest()[:n]


class MockSurveyClient(LLMClient):
    def complete(self, prompt: str) -> str:  # noqa: C901 - routing table
        if _tagged(prompt, "[INIT_OUTLINE]"):
            title = _title(prompt)
            keys = sorted(set(_BIBKEY_RE.findall(prompt)))
            lines = [f"# {title}"]
            for k in keys[:4]:
                lines.append(f"## Studies of {k}")
                lines.append(f"Covers the work of {k}.")
            return "```markdown\n" + "\n".join(lines) + "\n```"

        if _tagged(prompt, "[CONCAT_OUTLINE]"):
            title = _title(prompt)
            # harvest section headings from the embedded partial outlines
            # (always fenced by the pipeline); full-template instruction
            # headings live outside fences and are skipped
            fences = _FENCED_RE.findall(prompt)
            source = "\n".join(fences) if fences else prompt
            sections = sorted(set(_HEADING_RE.findall(source)))
            lines = [f"# {title}"]
            for s in sections:
                lines.append(f"## {s}")
                lines.append(f"Merged coverage of {s}.")
            return "```markdown\n" + "\n".join(lines) + "\n```"

        if _tagged(prompt, "[DIGEST]"):
            m = _PAPER_KEY_RE.search(prompt) or _REF_PAPER_KEY_RE.search(prompt)
            key = m.group(1) if m else "unknown"
            outline = _outline_in(prompt)
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

        if _tagged(prompt, "[FEEDBACK]") or _tagged(prompt, "[KERNEL]"):
            return f"```suggestion\nEmphasize theme {_h(prompt)}.\n```"

        if _tagged(prompt, "[MODIFY]"):
            outline = _outline_in(prompt)
            sugg = _SUGG_RE.search(prompt)
            body = outline.group(1) if outline else "# Untitled"
            tag = _h(sugg.group(1) if sugg else prompt, 6)
            lines = list(body.split("\n"))
            lines.append(f"Revision note {tag}.")
            return "```markdown\n" + "\n".join(lines) + "\n```"

        if _tagged(prompt, "[EVAL_OUTLINE]"):
            score = (int(_h(prompt), 16) % 101) / 10.0
            return f"Assessment.\n<SCORE>{score}</SCORE>"

        if _tagged(prompt, "[SELF_REFINE]"):
            return f"```suggestion\nTighten structure {_h(prompt, 6)}.\n```"

        if _tagged(prompt, "[ORCHESTRA]") or _tagged(prompt, "[SUMMARY]"):
            section = _section(prompt)
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

        if _tagged(prompt, "[GROUP]"):
            # cluster consecutive pairs of the listed bibkeys, leave the last
            # key ungrouped when odd (exercises the regroup repair pass);
            # full GROUP_PROMPT lists papers as `Title: "…" Bibkey: '…'`
            keys = (re.findall(r"- ([\w-]+)$", prompt, re.MULTILINE)
                    or _BIBKEY_RE.findall(prompt))
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

        if _tagged(prompt, "[QUERY_EXPAND]"):
            topic = _title(prompt)
            qs = "; ".join(f"{topic} {suffix}"
                           for suffix in ("survey", "methods", "benchmarks"))
            return f"```markdown\n{qs}\n```"

        if _tagged(prompt, "[SNIPPET_SCORE]") or _tagged(prompt, "[SIMILARITY]"):
            return f"relevance analysis\n<SCORE>{int(_h(prompt), 16) % 101}</SCORE>"

        if _tagged(prompt, "[PAGE_REFINE]"):
            if "[PAGE_REFINE]" in prompt:
                raw = prompt.split("Page:\n", 1)[-1]
            else:  # full PAGE_REFINE_PROMPT
                raw = prompt.split("Original web page content:\n", 1)[-1]
                raw = raw.split("\n\n[Output requirements]", 1)[0]
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

        if _tagged(prompt, "[POLISH]"):
            if "[POLISH]" in prompt:
                return prompt.split("Draft:\n", 1)[-1].strip()
            # full POLISH_PROMPT: content sits between [Content] and
            # [Output Requirements]
            body = prompt.split("[Content]\n", 1)[-1]
            return body.split("\n\n[Output Requirements]", 1)[0].strip()

        return HashEchoClient().complete(prompt)


class SpillingSurveyClient(MockSurveyClient):
    """Test helper: writes every prompt to ``spill_dir`` (local-mode FS is
    shared with the driver) before delegating to the mock routing — lets
    tests assert WHICH prompt texts the executors actually emitted."""

    def __init__(self, spill_dir: str):
        self.spill_dir = spill_dir

    def complete(self, prompt: str) -> str:
        import os
        import uuid

        with open(os.path.join(self.spill_dir, uuid.uuid4().hex), "w",
                  encoding="utf-8") as f:
            f.write(prompt)
        return super().complete(prompt)


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
        if _tagged(prompt, "[MODIFY]"):
            outline = _outline_in(prompt)
            body = outline.group(1) if outline else "# Untitled"
            if self.SECTION in body:
                return "```markdown\n" + body + "\n```"
            lines = body.split("\n")
            lines[1:1] = [f"## {self.SECTION}", "Cross-cutting new directions."]
            return "```markdown\n" + "\n".join(lines) + "\n```"
        return super().complete(prompt)
