"""Sources and sinks (SURVEY.md §2.1 S1-S10): JSONL survey IO, task
registry, exporters, and the interface-gated search/crawl front-end."""
