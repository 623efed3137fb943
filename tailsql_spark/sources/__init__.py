"""Streaming line sources: tail -f files, stdin, named pipes, and the
idiomatic directory file-stream.

Reference sources: ``/root/reference/source/fs.go`` (tail),
``source/stdin.go``, ``source/namedpipe.go``; dispatch at
``sql/squeryer.go:74-101``.
"""
