package graft.llm

/** Decoded 8-bit RGB image, the common output of every image codec here:
  * `pixels(y*width + x) = 0xRRGGBB`, top-down row-major — so downstream
  * feature math ([[Multimodal]]) is codec-agnostic. */
final case class RgbImage(width: Int, height: Int, pixels: Array[Int])
