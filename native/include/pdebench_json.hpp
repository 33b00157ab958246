// Minimal recursive-descent JSON parser for case-spec files.
//
// Single-header, no dependencies, C++17. Supports the JSON subset used
// by benchmark case specs (objects, arrays, strings, doubles, bools,
// null) with a small DOM and typed accessors. Written for the
// pdebench_tpu native runtime and the agent C++ sandbox (the reference
// used nlohmann/json inside its deal.II image; this repo vendors its
// own parser so agent binaries build with zero external deps).
//
// Usage:
//   auto v = pdebench::json::parse_file("case_spec.json");
//   double rtol = v["oracle_solver"]["rtol"].number_or(1e-10);
//   std::string dom = v["domain"]["type"].str();
#pragma once

#include <cctype>
#include <cstdint>
#include <fstream>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace pdebench {
namespace json {

class Value;
using ValuePtr = std::shared_ptr<Value>;

enum class Type { Null, Bool, Number, String, Array, Object };

class Value {
 public:
  Type type = Type::Null;
  bool b = false;
  double num = 0.0;
  std::string s;
  std::vector<ValuePtr> arr;
  std::map<std::string, ValuePtr> obj;

  static const Value& null_value() {
    static Value v;
    return v;
  }

  bool is_null() const { return type == Type::Null; }
  bool is_object() const { return type == Type::Object; }
  bool is_array() const { return type == Type::Array; }
  bool is_string() const { return type == Type::String; }
  bool is_number() const { return type == Type::Number; }

  const Value& operator[](const std::string& key) const {
    if (type != Type::Object) return null_value();
    auto it = obj.find(key);
    return it == obj.end() ? null_value() : *it->second;
  }
  const Value& operator[](size_t i) const {
    if (type != Type::Array || i >= arr.size()) return null_value();
    return *arr[i];
  }
  size_t size() const {
    return type == Type::Array ? arr.size()
                               : (type == Type::Object ? obj.size() : 0);
  }
  bool contains(const std::string& key) const {
    return type == Type::Object && obj.count(key) > 0;
  }

  double number_or(double fallback) const {
    if (type == Type::Number) return num;
    if (type == Type::Bool) return b ? 1.0 : 0.0;
    if (type == Type::String) {
      try {
        size_t pos = 0;
        double v = std::stod(s, &pos);
        if (pos == s.size()) return v;
      } catch (...) {
      }
    }
    return fallback;
  }
  long int_or(long fallback) const {
    if (type == Type::Number) return static_cast<long>(num);
    return fallback;
  }
  bool bool_or(bool fallback) const {
    return type == Type::Bool ? b : fallback;
  }
  std::string str_or(const std::string& fallback) const {
    if (type == Type::String) return s;
    if (type == Type::Number) {
      std::ostringstream os;
      os << num;
      return os.str();
    }
    return fallback;
  }
  const std::string& str() const {
    static const std::string empty;
    return type == Type::String ? s : empty;
  }
};

class Parser {
 public:
  explicit Parser(const std::string& text) : text_(text) {}

  ValuePtr parse() {
    skip_ws();
    ValuePtr v = parse_value();
    skip_ws();
    if (pos_ != text_.size()) fail("trailing characters");
    return v;
  }

 private:
  const std::string& text_;
  size_t pos_ = 0;

  [[noreturn]] void fail(const std::string& why) const {
    throw std::runtime_error("json parse error at byte " +
                             std::to_string(pos_) + ": " + why);
  }
  char peek() const { return pos_ < text_.size() ? text_[pos_] : '\0'; }
  char next() {
    if (pos_ >= text_.size()) fail("unexpected end");
    return text_[pos_++];
  }
  void skip_ws() {
    while (pos_ < text_.size() &&
           std::isspace(static_cast<unsigned char>(text_[pos_])))
      ++pos_;
  }
  void expect(char c) {
    if (next() != c) fail(std::string("expected '") + c + "'");
  }

  ValuePtr parse_value() {
    skip_ws();
    char c = peek();
    if (c == '{') return parse_object();
    if (c == '[') return parse_array();
    if (c == '"') return parse_string();
    if (c == 't' || c == 'f') return parse_bool();
    if (c == 'n') return parse_null();
    return parse_number();
  }

  ValuePtr parse_object() {
    auto v = std::make_shared<Value>();
    v->type = Type::Object;
    expect('{');
    skip_ws();
    if (peek() == '}') {
      ++pos_;
      return v;
    }
    while (true) {
      skip_ws();
      ValuePtr key = parse_string();
      skip_ws();
      expect(':');
      v->obj[key->s] = parse_value();
      skip_ws();
      char c = next();
      if (c == '}') break;
      if (c != ',') fail("expected ',' or '}'");
    }
    return v;
  }

  ValuePtr parse_array() {
    auto v = std::make_shared<Value>();
    v->type = Type::Array;
    expect('[');
    skip_ws();
    if (peek() == ']') {
      ++pos_;
      return v;
    }
    while (true) {
      v->arr.push_back(parse_value());
      skip_ws();
      char c = next();
      if (c == ']') break;
      if (c != ',') fail("expected ',' or ']'");
    }
    return v;
  }

  ValuePtr parse_string() {
    auto v = std::make_shared<Value>();
    v->type = Type::String;
    expect('"');
    while (true) {
      char c = next();
      if (c == '"') break;
      if (c == '\\') {
        char e = next();
        switch (e) {
          case '"': v->s += '"'; break;
          case '\\': v->s += '\\'; break;
          case '/': v->s += '/'; break;
          case 'b': v->s += '\b'; break;
          case 'f': v->s += '\f'; break;
          case 'n': v->s += '\n'; break;
          case 'r': v->s += '\r'; break;
          case 't': v->s += '\t'; break;
          case 'u': {
            // decode BMP escapes to UTF-8 (case specs are ASCII in practice)
            unsigned cp = 0;
            for (int i = 0; i < 4; ++i) {
              char h = next();
              cp <<= 4;
              if (h >= '0' && h <= '9') cp |= h - '0';
              else if (h >= 'a' && h <= 'f') cp |= h - 'a' + 10;
              else if (h >= 'A' && h <= 'F') cp |= h - 'A' + 10;
              else fail("bad \\u escape");
            }
            if (cp < 0x80) {
              v->s += static_cast<char>(cp);
            } else if (cp < 0x800) {
              v->s += static_cast<char>(0xC0 | (cp >> 6));
              v->s += static_cast<char>(0x80 | (cp & 0x3F));
            } else {
              v->s += static_cast<char>(0xE0 | (cp >> 12));
              v->s += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
              v->s += static_cast<char>(0x80 | (cp & 0x3F));
            }
            break;
          }
          default: fail("bad escape");
        }
      } else {
        v->s += c;
      }
    }
    return v;
  }

  ValuePtr parse_bool() {
    auto v = std::make_shared<Value>();
    v->type = Type::Bool;
    if (text_.compare(pos_, 4, "true") == 0) {
      v->b = true;
      pos_ += 4;
    } else if (text_.compare(pos_, 5, "false") == 0) {
      v->b = false;
      pos_ += 5;
    } else {
      fail("bad literal");
    }
    return v;
  }

  ValuePtr parse_null() {
    if (text_.compare(pos_, 4, "null") != 0) fail("bad literal");
    pos_ += 4;
    return std::make_shared<Value>();
  }

  ValuePtr parse_number() {
    size_t start = pos_;
    if (peek() == '-') ++pos_;
    while (pos_ < text_.size() &&
           (std::isdigit(static_cast<unsigned char>(text_[pos_])) ||
            text_[pos_] == '.' || text_[pos_] == 'e' || text_[pos_] == 'E' ||
            text_[pos_] == '+' || text_[pos_] == '-'))
      ++pos_;
    if (pos_ == start) fail("bad number");
    auto v = std::make_shared<Value>();
    v->type = Type::Number;
    v->num = std::stod(text_.substr(start, pos_ - start));
    return v;
  }
};

inline Value parse(const std::string& text) {
  Parser p(text);
  return *p.parse();
}

inline Value parse_file(const std::string& path) {
  std::ifstream in(path);
  if (!in) throw std::runtime_error("cannot open " + path);
  std::ostringstream ss;
  ss << in.rdbuf();
  return parse(ss.str());
}

}  // namespace json
}  // namespace pdebench
