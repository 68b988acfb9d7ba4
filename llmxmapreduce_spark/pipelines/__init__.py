"""End-to-end pipeline compositions (SURVEY.md §3): V1 long-doc QA and the
V2 survey-generation stages, each a chain of DataFrame operators with
bounded driver loops for the iterative parts."""
