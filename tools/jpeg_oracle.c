/* Test oracle around the SYSTEM libjpeg (libjpeg-turbo) — compiled on
 * demand by the test suite (skipped when cc/jpeglib are absent) so the
 * pure-Python JPEG codec in architxt_spark/functions/jpeg.py can be
 * validated against an independent implementation, the same way DuckDB
 * arbitrates the SQL surface.
 *
 *   jpeg_oracle d               < in.jpg  > out.pnm   (P5/P6, 8-bit)
 *   jpeg_oracle e W H C Q P A S R < raw   > out.jpg
 *
 * encode args: width, height, channels (1 gray / 3 RGB), quality 1-100,
 * P=1 progressive scan script, A=1 arithmetic entropy coding, S=1 force
 * 4:4:4 sampling, R = restart interval in MCUs (0 = none).
 */
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>

static unsigned char *slurp(FILE *f, unsigned long *n) {
  unsigned long cap = 1 << 20, len = 0;
  unsigned char *buf = malloc(cap);
  size_t got;
  while ((got = fread(buf + len, 1, cap - len, f)) > 0) {
    len += got;
    if (len == cap) buf = realloc(buf, cap <<= 1);
  }
  *n = len;
  return buf;
}

static int decode(void) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  unsigned long n;
  unsigned char *data = slurp(stdin, &n);
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  {
    int ch = cinfo.output_components;
    JDIMENSION w = cinfo.output_width, h = cinfo.output_height;
    unsigned char *row = malloc((size_t)w * ch);
    printf("P%c\n%u %u\n255\n", ch == 1 ? '5' : '6', w, h);
    while (cinfo.output_scanline < h) {
      JSAMPROW rows[1] = { row };
      jpeg_read_scanlines(&cinfo, rows, 1);
      fwrite(row, 1, (size_t)w * ch, stdout);
    }
    free(row);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  free(data);
  return 0;
}

static int encode(int argc, char **argv) {
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  int w = atoi(argv[2]), h = atoi(argv[3]), ch = atoi(argv[4]);
  int q = atoi(argv[5]), prog = atoi(argv[6]), arith = atoi(argv[7]);
  int s444 = argc > 8 ? atoi(argv[8]) : 1;
  int restart = argc > 9 ? atoi(argv[9]) : 0;
  unsigned long n;
  unsigned char *raw = slurp(stdin, &n);
  unsigned char *out = NULL;
  unsigned long outlen = 0;
  int y;
  if (n < (unsigned long)w * h * ch) {
    fprintf(stderr, "short raw input\n");
    return 2;
  }
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &out, &outlen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = ch;
  cinfo.in_color_space = ch == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, q, TRUE);
  if (s444) {
    int ci;
    for (ci = 0; ci < cinfo.num_components; ci++) {
      cinfo.comp_info[ci].h_samp_factor = 1;
      cinfo.comp_info[ci].v_samp_factor = 1;
    }
  }
  if (arith) cinfo.arith_code = TRUE;
  if (prog) jpeg_simple_progression(&cinfo);
  cinfo.restart_interval = restart;
  jpeg_start_compress(&cinfo, TRUE);
  for (y = 0; y < h; y++) {
    JSAMPROW rows[1] = { raw + (size_t)y * w * ch };
    jpeg_write_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_compress(&cinfo);
  fwrite(out, 1, outlen, stdout);
  jpeg_destroy_compress(&cinfo);
  free(raw);
  free(out);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 2 && argv[1][0] == 'd') return decode();
  if (argc >= 8 && argv[1][0] == 'e') return encode(argc, argv);
  fprintf(stderr, "usage: jpeg_oracle d | e W H C Q prog arith [s444 restart]\n");
  return 2;
}
