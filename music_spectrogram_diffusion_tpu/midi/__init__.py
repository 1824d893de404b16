"""MIDI front end: event codec, vocabularies, note sequences, RLE."""
