"""Output sinks: FASTQ (BGZF), FAST5 repack, sequencing summary, nanopolish
readdb, dump inventories, final summary (roles of poreplex/io.py)."""
