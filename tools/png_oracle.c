/* Test oracle around the SYSTEM libpng — compiled on demand by the
 * test suite (skipped when cc/libpng are absent) so the pure-Python
 * PNG codec in architxt_spark/functions/multimodal.py can be validated
 * against an independent implementation.  PNG is lossless, so every
 * comparison is EXACT.
 *
 *   png_oracle d             < in.png > "C W H\n" + raw samples
 *   png_oracle e W H C I     < raw    > out.png   (I=1: Adam7)
 *
 * Decode applies exactly the transforms the Python decoder defines:
 * palette->RGB, 1/2/4-bit gray expand, 16-bit stripped to the HIGH
 * byte, no gamma/colorspace handling.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <png.h>

static unsigned char *slurp(FILE *f, size_t *n) {
  size_t cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  size_t got;
  while ((got = fread(buf + len, 1, cap - len, f)) > 0) {
    len += got;
    if (len == cap) buf = realloc(buf, cap <<= 1);
  }
  *n = len;
  return buf;
}

struct mem { const unsigned char *data; size_t len, pos; };

static void mem_read(png_structp png, png_bytep out, png_size_t want) {
  struct mem *m = png_get_io_ptr(png);
  if (m->pos + want > m->len) png_error(png, "short read");
  memcpy(out, m->data + m->pos, want);
  m->pos += want;
}

static int decode(void) {
  size_t n;
  unsigned char *data = slurp(stdin, &n);
  struct mem m = { data, n, 0 };
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) { fprintf(stderr, "decode error\n"); return 3; }
  png_set_read_fn(png, &m, mem_read);
  png_read_info(png, info);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_16(png);  /* high byte, matching the Python decoder */
  png_read_update_info(png, info);
  {
    png_uint_32 w = png_get_image_width(png, info);
    png_uint_32 h = png_get_image_height(png, info);
    int ch = png_get_channels(png, info);
    size_t stride = (size_t)w * ch;
    unsigned char *img = malloc(stride * h);
    png_bytep *rows = malloc(h * sizeof(png_bytep));
    png_uint_32 y;
    for (y = 0; y < h; y++) rows[y] = img + y * stride;
    png_read_image(png, rows);  /* handles Adam7 internally */
    printf("%d %u %u\n", ch, w, h);
    fwrite(img, 1, stride * h, stdout);
  }
  return 0;
}

static void mem_write(png_structp png, png_bytep in, png_size_t len) {
  fwrite(in, 1, len, stdout);
}
static void mem_flush(png_structp png) { (void)png; }

static int encode(char **argv) {
  int w = atoi(argv[2]), h = atoi(argv[3]), ch = atoi(argv[4]);
  int interlace = atoi(argv[5]);
  int types[5] = { 0, PNG_COLOR_TYPE_GRAY, PNG_COLOR_TYPE_GRAY_ALPHA,
                   PNG_COLOR_TYPE_RGB, PNG_COLOR_TYPE_RGB_ALPHA };
  size_t n;
  unsigned char *raw = slurp(stdin, &n);
  png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING, NULL, NULL, NULL);
  png_infop info = png_create_info_struct(png);
  int y, p, passes;
  png_bytep *rows = malloc(h * sizeof(png_bytep));
  if (n < (size_t)w * h * ch) { fprintf(stderr, "short raw input\n"); return 2; }
  if (setjmp(png_jmpbuf(png))) { fprintf(stderr, "encode error\n"); return 3; }
  png_set_write_fn(png, NULL, mem_write, mem_flush);
  png_set_IHDR(png, info, w, h, 8, types[ch],
               interlace ? PNG_INTERLACE_ADAM7 : PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  for (y = 0; y < h; y++) rows[y] = raw + (size_t)y * w * ch;
  passes = png_set_interlace_handling(png);
  for (p = 0; p < passes; p++)
    for (y = 0; y < h; y++)
      png_write_row(png, rows[y]);
  png_write_end(png, info);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 2 && argv[1][0] == 'd') return decode();
  if (argc >= 6 && argv[1][0] == 'e') return encode(argv);
  fprintf(stderr, "usage: png_oracle d | e W H C interlace\n");
  return 2;
}
