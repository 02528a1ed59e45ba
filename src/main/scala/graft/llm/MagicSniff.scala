package graft.llm

/** Magic-number format dispatch — the FIRST pass over a 100 TB media
  * lake: before any decoder runs, every blob gets a cheap, bounded
  * kind verdict from its leading bytes, and the census (counts per
  * kind, unknown rate) decides which decode tiers to schedule at all.
  * q197's decode-health audit runs the decoders; this is the router
  * in front of them.
  *
  * Detection is LONGEST-MAGIC-FIRST and positional (RIFF needs the
  * form type at offset 8; tar's `ustar` sits at 257) — a first-match
  * table over prefixes alone mislabels every RIFF as "wav" and every
  * tarball as "unknown". TGA is the deliberate negative: the format
  * HAS no magic (its header is all numeric fields), so TGA blobs
  * report "unknown" — a sniffer that claims TGA is guessing, and the
  * census must say so honestly.
  *
  * Row-local, reads ≤ 265 bytes per blob, never throws: null/short
  * blobs are "unknown". */
object MagicSniff extends Serializable {

  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length < 4) return "unknown"
    def at(o: Int, s: String): Boolean =
      b.length >= o + s.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)
    def u8(o: Int): Int = b(o) & 0xff
    if (u8(0) == 0x89 && at(1, "PNG")) "png"
    else if (at(0, "GIF8")) "gif"
    else if (u8(0) == 0xff && u8(1) == 0xd8 && u8(2) == 0xff) "jpeg"
    else if (at(0, "BM")) "bmp"
    else if (at(0, "qoif")) "qoi"
    else if (at(0, "OggS")) "ogg"
    else if (at(0, "RIFF") && at(8, "WAVE")) "wav"
    else if (at(0, "RIFF") && at(8, "AVI ")) "avi"
    else if (at(0, "RIFF")) "riff" // unknown RIFF form — not wav, not avi
    else if (at(0, "%PDF")) "pdf"
    else if (at(0, "PK") && u8(2) == 3 && u8(3) == 4) "zip"
    else if (u8(0) == 0x1f && u8(1) == 0x8b) "gzip"
    else if (at(0, "ID3")) "mp3"
    else if (u8(0) == 0xff && (u8(1) & 0xe0) == 0xe0) "mp3" // frame sync
    else if (b.length >= 12 && at(4, "ftyp")) "mp4"
    else if (at(257, "ustar")) "tar"
    else if (u8(0) == 0 && u8(1) == 0 && u8(2) == 1 && u8(3) == 0) "ico"
    else if (b(0) == 'P' && b(1) >= '2' && b(1) <= '6' &&
      (b(2) == ' ' || b(2) == '\n' || b(2) == '\t')) "pnm"
    else if (at(0, "WEBVTT")) "vtt"
    else if (at(0, "{\\rtf")) "rtf"
    else "unknown"
  }
}
