"""Structured Streaming surface (SURVEY.md §2.2 "Streaming" —
absent in the reference, north-star scope): event-time windows
(tumbling/sliding/session), watermarks, and batch-equivalent
semantics tested via availableNow replay of the events fixture.
"""
