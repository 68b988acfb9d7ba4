"""Structured Streaming operators over the events stream (SURVEY.md §1.3).

The reference's "streaming" is gevent job pipelining (async_d/), which batch
Spark already covers; the genuinely stateful streaming surface — windowed
aggregations with watermarked late-data handling — lives here.
"""
