"""Readers and sinks for the transcript lake."""
